package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchAggregates
import org.scalatest.funsuite.AnyFunSuite

/** The histogram sketch's contract: a fixed mergeable counter array
  * whose bin assignment is `clamp((v − lo) div width, 0, nBins−1)` —
  * so the aggregate must be invariant to partitioning, the two-level
  * rollup (per-group `hist_sketch` → `hist_merge`) must be BIT-equal
  * to a single pass (counts are additive), clamps must be part of the
  * definition, and the rank-interpolated quantile estimate must land
  * within one bin width of the exact rank statistic.
  */
class HistSketchSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
  private val (lo, w, nBins) = (0L, 16L, 64)

  private def hist(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
    df.groupBy($"lang")
      .agg(SketchAggregates.histSketch($"n_chars", lo, w, nBins).as("hist"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("sketch is invariant to partitioning (merge associativity)") {
    assert(hist(docs.repartition(7, $"doc_id")) == hist(docs.coalesce(1)))
  }

  test("two-level rollup (per-source sketch → hist_merge) is bit-equal to one pass") {
    val perSource = docs.groupBy($"lang", $"source")
      .agg(SketchAggregates.histSketch($"n_chars", lo, w, nBins).as("hist"))
    val rolled = perSource.groupBy($"lang")
      .agg(SketchAggregates.histMerge($"hist", nBins).as("hist"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rolled == hist(docs))
  }

  test("bin assignment clamps below lo and past the last bin") {
    val vals = Seq(-100L, -1L, 0L, 15L, 16L, 1023L, 1024L, 999999L)
    val got = vals.toDF("v")
      .agg(SketchAggregates.histSketch($"v", lo, w, nBins).as("hist"))
      .collect().head.getSeq[Long](0)
    val expected = Array.fill(nBins)(0L)
    vals.foreach { v =>
      val b = Math.floorDiv(v - lo, w)
      expected(if (b < 0) 0 else if (b >= nBins) nBins - 1 else b.toInt) += 1
    }
    assert(got == expected.toSeq)
    // bin 0: −100, −1 clamped + 0, 15 genuine; bin 63: 1023 genuine + 1024, 999999 clamped
    assert(got.head == 4L && got.last == 3L)
  }

  test("nulls are ignored; an empty group yields all zeros") {
    val got = Seq[(java.lang.Long, Int)]((null, 1), (null, 2)).toDF("v", "g")
      .groupBy($"g").agg(SketchAggregates.histSketch($"v", lo, w, nBins).as("hist"))
      .collect().map(_.getSeq[Long](1))
    assert(got.forall(_.forall(_ == 0L)))
  }

  test("hist_merge rejects arrays of the wrong bin count") {
    val e = intercept[Exception] {
      Seq(Seq(1L, 2L, 3L)).toDF("hist")
        .agg(SketchAggregates.histMerge($"hist", nBins)).collect()
    }
    assert(e.getMessage != null)
  }

  test("q124: interpolated estimate is within one bin width of the exact rank statistic") {
    val rows = graft.queries.QueryPack.all("q124_hist_quantile")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50e, p50h) = (r.getAs[Long]("p50_exact"), r.getAs[Long]("p50_hist_micro"))
      val (p95e, p95h) = (r.getAs[Long]("p95_exact"), r.getAs[Long]("p95_hist_micro"))
      assert(math.abs(p50h / 1e6 - p50e) <= w.toDouble,
        s"${r.getString(0)} p50 est ${p50h / 1e6} vs exact $p50e")
      assert(math.abs(p95h / 1e6 - p95e) <= w.toDouble,
        s"${r.getString(0)} p95 est ${p95h / 1e6} vs exact $p95e")
    }
  }
}
