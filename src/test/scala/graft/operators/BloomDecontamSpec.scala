package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomExpressions
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-prefiltered decontamination ([[Dedup.bloomDecontaminate]], q94):
  * the output contract is EXACTLY q55's — the Bloom stage is a pure
  * execution-strategy change (no false negatives; false positives die in
  * the exact verify join). These specs pin that equivalence on the real
  * corpus, the threshold semantics on planted overlaps, and the
  * no-false-negative / bounded-false-positive behavior of the native
  * expression itself under codegen.
  */
class BloomDecontamSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  test("bloom decontamination ≡ the q55 broadcast-join path on the real corpus") {
    val docs = graft.Tables.documents(spark, dir)
    val viaBloom = Dedup.bloomDecontaminate(
      docs.filter(col("doc_id") % 100 =!= 0),
      docs.filter(col("doc_id") % 100 === 0),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJoin = graft.queries.QueryPack.decontamination(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBloom === viaJoin)
  }

  test("planted overlap: exactly minShared shared 3-grams flags; one fewer does not") {
    import spark.implicits._
    val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a b c d e x"), // shares "a b c","b c d","c d e" → 3 → flagged
      (2L, "a b c d x y"), // shares "a b c","b c d"         → 2 → clean
      (3L, "p q r s t u")  // shares nothing
    ).toDF("doc_id", "text")
    val got = Dedup.bloomDecontaminate(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L))
  }

  test("bloom_might_contain: no false negatives; FP rate stays near the configured fpp") {
    import spark.implicits._
    val members = (0L until 2000L).map(i => i * 2654435761L + 17L)
    val filter = BloomFilter.create(members.size.toLong, 0.01)
    members.foreach(filter.putLong)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      filter.writeTo(bos)
      bos.toByteArray
    }
    // every inserted member must survive (codegen'd path via DataFrame)
    val kept = members.toDF("h")
      .filter(BloomExpressions.mightContainLong(col("h"), bytes)).count()
    assert(kept === members.size.toLong, "a Bloom filter must have no false negatives")
    // non-members survive at ~fpp (deterministic probe set; generous 5× bound)
    val nonMembers = (1L to 20000L).map(i => i * 0x9E3779B97F4A7C15L + 3L)
      .filterNot(members.toSet)
    val fp = nonMembers.toDF("h")
      .filter(BloomExpressions.mightContainLong(col("h"), bytes)).count()
    assert(fp.toDouble / nonMembers.size < 0.05,
      s"false-positive rate ${fp.toDouble / nonMembers.size} far above fpp=0.01")
  }

  test("q94 plan: the bloom probe runs below the verify join, which stays an equi-join") {
    val df = graft.queries.QueryPack.bloomDecontam(spark, dir)
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"expected the native bloom probe in:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"verify join must stay an equi-join:\n$plan")
    // the probe must sit in the scan-side stage, before any exchange:
    // the first Exchange in the plan text appears AFTER the filter line
    val probeIdx = plan.indexOf("bloom_might_contain")
    val firstJoinIdx = plan.indexOf("Join")
    assert(probeIdx > firstJoinIdx,
      s"bloom probe should be below (printed after) the join in:\n$plan")
  }
}
