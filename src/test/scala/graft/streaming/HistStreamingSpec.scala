package graft.streaming

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchAggregates
import org.scalatest.funsuite.AnyFunSuite

/** Histogram sketch under STRUCTURED STREAMING — the distribution-side
  * twin of [[CmsStreamingSpec]]/[[KmvStreamingSpec]]: the same
  * `hist_sketch` column lands in a watermarked windowed groupBy, its
  * FIXED nBins counter array serializes through the state store, merges
  * by element-wise addition across micro-batches, and survives
  * checkpoint restart — streaming per-window quantiles whose state is a
  * constant 512 bytes regardless of value cardinality.
  */
class HistStreamingSpec extends AnyFunSuite with SparkTest {

  import java.nio.file.Files
  import java.sql.Timestamp

  private def ts(minutes: Long) = new Timestamp(minutes * 60000L)
  private val (lo, w, nBins) = (0L, 16L, 64)

  test("windowed histogram merges across micro-batches and survives restart") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("hist-src").toString
    val outDir = Files.createTempDirectory("hist-out").toString
    val ckptDir = Files.createTempDirectory("hist-ckpt").toString
    def append(rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "v").coalesce(1).write.mode("append").parquet(srcDir)
    def startQuery() = {
      val stream = spark.readStream
        .schema("ts timestamp, v bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      graft.operators.WindowedAgg.tumbling(stream, "ts", "5 minutes",
          "10 minutes", Seq.empty,
          Seq(SketchAggregates.histSketch(col("v"), lo, w, nBins).as("hist"),
            count(lit(1)).as("rows")))
        .select(col("window_start"), col("hist"), col("rows"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").start()
    }
    // window [0,5): bin 2 (values 32..47) receives mass SPLIT ACROSS TWO
    // FILES (2 + 1) — only a correct cross-micro-batch merge reads 3;
    // one clamped outlier lands in the last bin
    append(Seq((ts(1), 33L), (ts(2), 40L), (ts(3), 999999L)))
    append(Seq((ts(4), 47L), (ts(4), 100L)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    // restart from checkpoint; ts=33 advances the watermark past [0,5)
    append(Seq((ts(33), 1L)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(outDir)
      .filter(col("window_start") === ts(0))
      .select(col("hist"), col("rows")).collect()
    assert(out.length == 1, "window [0,5) must close exactly once")
    val hist = out.head.getSeq[Long](0)
    assert(out.head.getLong(1) == 5L)
    assert(hist.length == nBins && hist.sum == 5L)
    assert(hist(2) == 3L, s"split bin must merge to 3, got ${hist(2)}")
    assert(hist(nBins - 1) == 1L, "outlier clamps into the last bin")
    assert(hist(100 / 16) == 1L)
  }

  test("streaming histogram equals the batch sketch array on the same rows") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("hist-eq-src").toString
    val ckptDir = Files.createTempDirectory("hist-eq-ckpt").toString
    val rows = (0 until 60).map(i => (ts(i % 4), (i.toLong * 37L) % 1100L))
    rows.grouped(15).foreach { g =>
      g.toDF("ts", "v").coalesce(1).write.mode("append").parquet(srcDir)
    }
    val stream = spark.readStream.schema("ts timestamp, v bigint")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val streamed = graft.operators.WindowedAgg.tumbling(stream, "ts",
        "5 minutes", "10 minutes", Seq.empty,
        Seq(SketchAggregates.histSketch(col("v"), lo, w, nBins).as("hist")))
      .select(col("window_start"), col("hist"))
    val q = streamed.writeStream.format("memory").queryName("hist_eq")
      .option("checkpointLocation", ckptDir).outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT hist FROM hist_eq").collect()
      .map(_.getSeq[Long](0)).head
    val want = rows.toDF("ts", "v")
      .agg(SketchAggregates.histSketch(col("v"), lo, w, nBins).as("hist"))
      .collect().head.getSeq[Long](0)
    assert(got == want, "streamed sketch must be bit-equal to the batch sketch")
  }
}
