package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorAvgSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("vector_avg matches the avg(element_at) construction on the real corpus") {
    // force multi-partition input so partial-buffer MERGE is exercised
    val emb = graft.Tables.embeddings(spark, sfDir).repartition(7)
    val native = emb.groupBy($"label")
      .agg(VectorFunctions.vectorAvg($"embedding", 64).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val classic = emb.groupBy($"label")
      .agg(array((0 until 64).map(i =>
        avg(element_at($"embedding", i + 1).cast("double"))): _*).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(native.keySet == classic.keySet)
    for (k <- native.keySet; i <- 0 until 64)
      // both are double means over partial-order-dependent sums; agree
      // to summation noise
      assert(math.abs(native(k)(i) - classic(k)(i)) < 1e-12,
        s"label $k dim $i: ${native(k)(i)} vs ${classic(k)(i)}")
  }

  test("vector_avg ignores null vectors, poisons on null elements and length mismatch") {
    val rows = Seq(
      (1, Some(Seq[java.lang.Double](1.0, 3.0))),
      (1, Some(Seq[java.lang.Double](3.0, 5.0))),
      (1, None), // null vector: ignored
      (2, Some(Seq[java.lang.Double](1.0, null))), // null element: poisons
      (3, Some(Seq[java.lang.Double](1.0)))) // wrong length: poisons
      .toDF("g", "v")
    val got = rows.groupBy($"g")
      .agg(VectorFunctions.vectorAvg($"v", 2).as("c"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(got(1) == Seq(2.0, 4.0))
    assert(got(2) == null)
    assert(got(3) == null)
  }

  test("vector_avg of an all-null group is null") {
    val rows = Seq((1, None: Option[Seq[Double]])).toDF("g", "v")
    val got = rows.groupBy($"g").agg(VectorFunctions.vectorAvg($"v", 2).as("c")).collect()
    assert(got.head.isNullAt(1))
  }
}
