package graft.queries

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture gates for the weighted-sample (q113) and collocation
  * (q114) queries — the oracle pins the arithmetic at corpus scale;
  * these pin the SEMANTICS the arithmetic is supposed to implement:
  * sequential Poisson sampling must respond to weight (a heavy doc
  * enters the sample that excluded it when light), be partitioning-
  * invariant, and drop non-positive weights; collocation lift must rank
  * an always-adjacent phrase above bigger-count independent pairs and
  * enforce minimum support.
  */
class SamplingQueriesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String, Long)]) =
    rows.toDF("doc_id", "lang", "text", "n_chars")

  test("weighted sample: inflating a loser's weight pulls it into the sample") {
    val base = docsDf((1L to 40L).map(i => (i, "en", s"doc $i", 100L)))
    val k = 5
    val uniform = QueryPack.weightedSampleDocs(base, col("n_chars"), k)
      .select("doc_id").as[Long].collect().toSet
    assert(uniform.size == k)
    val loser = (1L to 40L).find(!uniform.contains(_)).get
    // priority = u/w: scaling one doc's weight by 2^40 divides ONLY its
    // priority — sequential Poisson inclusion is monotone in weight
    val boosted = QueryPack.weightedSampleDocs(
      base.withColumn("n_chars",
        when(col("doc_id") === loser, lit(1L << 40)).otherwise(col("n_chars"))),
      col("n_chars"), k)
      .select("doc_id").as[Long].collect().toSet
    assert(boosted.contains(loser), s"boosted doc $loser must be sampled")
    // and the displaced doc is exactly one of the old picks
    assert((uniform -- boosted).size == 1)
  }

  test("weighted sample: partitioning-invariant and per-stratum") {
    val rows = (1L to 30L).map(i => (i, "en", s"d $i", 50L + i)) ++
      (31L to 60L).map(i => (i, "de", s"d $i", 50L + i))
    val base = docsDf(rows)
    val a = QueryPack.weightedSampleDocs(base, col("n_chars"), 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val b = QueryPack.weightedSampleDocs(base.repartition(13), col("n_chars"), 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a == b, "sample must not depend on partitioning")
    assert(a.count(_._1 == "en") == 5 && a.count(_._1 == "de") == 5)
  }

  test("weighted sample: non-positive weights are excluded") {
    val base = docsDf(Seq((1L, "en", "a", 0L), (2L, "en", "b", -3L),
      (3L, "en", "c", 10L)))
    val got = QueryPack.weightedSampleDocs(base, col("n_chars"), 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("collocations: an always-adjacent phrase out-ranks frequent independents") {
    // "qz vx" occurs 6 times, always together (c_a = c_b = n_ab = 6 →
    // lift = n/6); "aa bb" co-occur 6 times but each also appears alone
    // 18 more times (lift = 6n/(24·24) ≈ n/96) — association must beat
    // raw count parity
    val planted = (1L to 6L).map(i => (i, "en", "qz vx filler" + i, 10L))
    val indep = (7L to 12L).map(i => (i, "en", "aa bb filler" + i, 10L)) ++
      (13L to 30L).map(i => (i, "en", "aa pad bb other" + i, 10L))
    val out = QueryPack.collocationsDocs(docsDf(planted ++ indep),
      minSupport = 5, topN = 10).collect()
    assert(out.head.getString(0) == "qz" && out.head.getString(1) == "vx",
      s"planted phrase must rank first, got ${out.head}")
    val liftOf = out.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(liftOf(("qz", "vx")) > liftOf.getOrElse(("aa", "bb"), 0.0))
  }

  test("collocations: support filter drops rare pairs") {
    val rare = (1L to 4L).map(i => (i, "en", "uu ww tail" + i, 10L))
    val ok = (5L to 10L).map(i => (i, "en", "mm nn tail" + i, 10L))
    val out = QueryPack.collocationsDocs(docsDf(rare ++ ok),
      minSupport = 5, topN = 10)
      .select("w1", "w2").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!out.contains(("uu", "ww")), "4-count pair must be filtered")
    assert(out.contains(("mm", "nn")))
  }
}
