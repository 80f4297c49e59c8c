package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions
import org.scalatest.funsuite.AnyFunSuite

/** sorted_intersect_count through the DataFrame/codegen path: must equal
  * size(array_intersect(...)) on ascending-distinct arrays — the
  * contract that lets the dedup verify stages swap the generic
  * (allocating) form for the native merge.
  */
class SortedIntersectSpec extends AnyFunSuite with SparkTest {

  test("matches size(array_intersect) on shingle-hash arrays from real text") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "pack my box with five dozen liquor jugs",
      "a b", "a", "", "the the the the"
    ).toDF("text")
    val pairs = docs.select(TextFunctions.shingleHashes(col("text"), 2).as("sh"))
      .crossJoin(docs.select(TextFunctions.shingleHashes(col("text"), 2).as("sh2")))
    val diff = pairs.select(
        VectorExpressions.sortedIntersectCount(col("sh"), col("sh2")).as("native"),
        size(array_intersect(col("sh"), col("sh2"))).as("generic"))
      .filter(col("native") =!= col("generic"))
    assert(diff.count() == 0)
  }

  test("any null element poisons the count — even past pointer exhaustion") {
    import spark.implicits._
    // the trailing NULL in (1) vs (1, NULL) is never reached by the
    // two-pointer merge; the tail scan must still null the count
    val df = Seq((Seq[java.lang.Long](1L), Seq[java.lang.Long](1L, null)))
      .toDF("a", "b")
    val rows = df.select(
      VectorExpressions.sortedIntersectCount(col("a"), col("b")).as("ab"),
      VectorExpressions.sortedIntersectCount(col("b"), col("a")).as("ba"))
      .collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1))
  }

  test("identical arrays count fully; disjoint count zero") {
    import spark.implicits._
    val df = Seq((Seq(1L, 5L, 9L), Seq(1L, 5L, 9L), Seq(2L, 6L))).toDF("a", "b", "c")
    val row = df.select(
      VectorExpressions.sortedIntersectCount(col("a"), col("b")).as("same"),
      VectorExpressions.sortedIntersectCount(col("a"), col("c")).as("disj"))
      .collect().head
    assert(row.getAs[Int]("same") == 3 && row.getAs[Int]("disj") == 0)
  }
}
