package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CmsSketch, SketchAggregates, TextHashExpressions, TextHashOps}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The count-min sketch's contract: a FIXED depth×width counter array
  * whose row-i bucket is mix64(h XOR (i+1)·φ) mod width — so the
  * aggregate must equal a driver-side replay of that definition, be
  * invariant to partitioning (merge = element-wise add), NEVER
  * underestimate, and be exact for any key that owns a private bucket
  * in at least one row. The read side (`cmsEstimate`, pure column
  * arithmetic) must agree with the JVM min-over-rows on every key.
  */
class CmsSketchSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val (depth, width) = (4, 64)
  private val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
  private def toks = docs.select(explode(TextFunctions.tokens($"text")).as("t"))

  private def sketchArray(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(SketchAggregates.cmsSketch(
        TextHashExpressions.fnv64($"t"), depth, width).as("sk"))
      .collect().head.getSeq[Long](0).toArray

  private def jvmSketch(counts: Map[String, Long]): Array[Long] = {
    val buf = new Array[Long](depth * width)
    counts.foreach { case (t, c) =>
      val h = TextHashOps.fnv64(UTF8String.fromString(t))
      (0 until depth).foreach { i =>
        buf(i * width + CmsSketch.bucket(h, i, width)) += c
      }
    }
    buf
  }

  private lazy val exactCounts: Map[String, Long] =
    toks.groupBy($"t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("cms sketch equals the driver-side bucket replay") {
    assert(sketchArray(toks).toSeq == jvmSketch(exactCounts).toSeq)
  }

  test("cms sketch is partition-invariant (merge = element-wise add)") {
    val base = sketchArray(toks).toSeq
    for (p <- Seq(1, 7, 32)) {
      assert(sketchArray(toks.repartition(p)).toSeq == base,
        s"sketch must not depend on partitioning (p=$p)")
    }
  }

  test("estimate never underestimates; exact for keys with a private bucket") {
    val sk = jvmSketch(exactCounts)
    def estimate(t: String): Long = {
      val h = TextHashOps.fnv64(UTF8String.fromString(t))
      (0 until depth).map(i => sk(i * width + CmsSketch.bucket(h, i, width))).min
    }
    // bucket occupancy per row — a key whose row-i bucket holds only
    // itself is exact in that row, hence exact in the min
    val occupancy: Map[(Int, Int), Int] = exactCounts.keys.toSeq
      .flatMap { t =>
        val h = TextHashOps.fnv64(UTF8String.fromString(t))
        (0 until depth).map(i => (i, CmsSketch.bucket(h, i, width)))
      }.groupBy(identity).map { case (k, v) => k -> v.size }
    var exactKeys = 0
    exactCounts.foreach { case (t, c) =>
      val est = estimate(t)
      assert(est >= c, s"cms underestimated '$t': $est < $c")
      val h = TextHashOps.fnv64(UTF8String.fromString(t))
      val hasPrivate = (0 until depth).exists(i =>
        occupancy((i, CmsSketch.bucket(h, i, width))) == 1)
      if (hasPrivate) { assert(est == c, s"private-bucket key '$t' not exact"); exactKeys += 1 }
    }
    // the corpus must actually exercise the exact path for the test to
    // mean anything (vocabulary ~> width guarantees collisions exist too)
    assert(exactKeys > 0, "no private-bucket key at this width — widen the test")
  }

  test("cmsEstimate column form agrees with the JVM min-over-rows on every key") {
    val skDf = toks.agg(SketchAggregates.cmsSketch(
      TextHashExpressions.fnv64($"t"), depth, width).as("sk"))
    val sk = jvmSketch(exactCounts)
    val got = toks.distinct().crossJoin(broadcast(skDf))
      .select($"t", SketchAggregates.cmsEstimate(
        $"sk", TextHashExpressions.fnv64($"t"), depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exactCounts.keys.foreach { t =>
      val h = TextHashOps.fnv64(UTF8String.fromString(t))
      val want = (0 until depth).map(i => sk(i * width + CmsSketch.bucket(h, i, width))).min
      assert(got(t) == want, s"column estimate for '$t'")
    }
  }

  test("width must be a power of two and depth bounded") {
    intercept[IllegalArgumentException] {
      toks.agg(SketchAggregates.cmsSketch(
        TextHashExpressions.fnv64($"t"), 4, 63)).collect()
    }
    intercept[IllegalArgumentException] {
      toks.agg(SketchAggregates.cmsSketch(
        TextHashExpressions.fnv64($"t"), 0, 64)).collect()
    }
  }
}
