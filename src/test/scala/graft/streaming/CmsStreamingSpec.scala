package graft.streaming

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CmsSketch, SketchAggregates}
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch under STRUCTURED STREAMING — the frequency-side
  * twin of [[KmvStreamingSpec]]: the same `cmsSketch` column lands in a
  * watermarked windowed groupBy, its FIXED depth×width counter array
  * serializes through the state store, merges by element-wise addition
  * across micro-batches, and survives checkpoint restart — the
  * streaming heavy-hitter pass whose per-window state is a constant
  * 2 KiB regardless of key cardinality.
  */
class CmsStreamingSpec extends AnyFunSuite with SparkTest {

  import java.nio.file.Files
  import java.sql.Timestamp

  private def ts(minutes: Long) = new Timestamp(minutes * 60000L)
  private val (depth, width) = (4, 64)

  test("windowed CMS merges across micro-batches and survives restart") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("cms-src").toString
    val outDir = Files.createTempDirectory("cms-out").toString
    val ckptDir = Files.createTempDirectory("cms-ckpt").toString
    def append(rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "h").coalesce(1).write.mode("append").parquet(srcDir)
    def startQuery() = {
      val stream = spark.readStream
        .schema("ts timestamp, h bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      graft.operators.WindowedAgg.tumbling(stream, "ts", "5 minutes",
          "10 minutes", Seq.empty,
          Seq(SketchAggregates.cmsSketch(col("h"), depth, width).as("sk"),
            count(lit(1)).as("rows")))
        .select(col("window_start"), col("sk"), col("rows"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").start()
    }
    // window [0,5): key 7 appears 5× SPLIT ACROSS TWO FILES (3 + 2) —
    // only a correct cross-micro-batch merge reads 5; key 99 once
    append(Seq((ts(1), 7L), (ts(2), 7L), (ts(3), 7L), (ts(3), 99L)))
    append(Seq((ts(4), 7L), (ts(4), 7L)))
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
      .select(col("sk"), col("rows")).collect()
    assert(out.length == 1, "window [0,5) must close exactly once")
    val sk = out.head.getSeq[Long](0).toArray
    assert(out.head.getLong(1) == 6L)
    assert(sk.length == depth * width)
    assert(sk.sum == depth * 6L, "each row of counters absorbs every update once")
    def estimate(h: Long): Long =
      (0 until depth).map(i => sk(i * width + CmsSketch.bucket(h, i, width))).min
    // never-under, and on this tiny window no collision mass: exact
    assert(estimate(7L) == 5L, s"merged estimate for the split key, got ${estimate(7L)}")
    assert(estimate(99L) == 1L)
  }

  test("streaming CMS equals the batch sketch array on the same rows") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("cms-eq-src").toString
    val ckptDir = Files.createTempDirectory("cms-eq-ckpt").toString
    val rows = (0 until 60).map(i => (ts(i % 4), (i.toLong * 2654435761L) % 17L))
    rows.grouped(15).foreach { g =>
      g.toDF("ts", "h").coalesce(1).write.mode("append").parquet(srcDir)
    }
    val stream = spark.readStream.schema("ts timestamp, h bigint")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = graft.operators.WindowedAgg.tumbling(stream, "ts", "5 minutes",
        "10 minutes", Seq.empty,
        Seq(SketchAggregates.cmsSketch(col("h"), depth, width).as("sk")))
      .select(col("window_start"), col("sk"))
      .writeStream.format("memory").queryName("cms_eq")
      .option("checkpointLocation", ckptDir).outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_eq")
      .filter(col("window_start") === ts(0))
      .select(col("sk")).collect().head.getSeq[Long](0)
    val batch = rows.toDF("ts", "h").filter(col("ts") < ts(5))
      .agg(SketchAggregates.cmsSketch(col("h"), depth, width).as("sk"))
      .select(col("sk")).collect().head.getSeq[Long](0)
    assert(streamed == batch,
      "the streamed counter array must be bit-equal to the batch sketch")
  }
}
