package graft.streaming

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchAggregates
import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct-count sketch under STRUCTURED STREAMING — the drop-in
  * the `TypedImperativeAggregate` design promises: the same
  * `kmvSketch` column lands in a watermarked windowed groupBy, its
  * bounded (≤ k longs) buffer serializes through the state store,
  * merges across micro-batches, and survives checkpoint restart —
  * giving the streaming jobs an exactly-SQL-replayable distinct count
  * next to approx_count_distinct's HLL (COVERAGE.md §2.3). Same
  * watermark-advance choreography + restart protocol as
  * [[StreamingSemanticsSpec]].
  */
class KmvStreamingSpec extends AnyFunSuite with SparkTest {

  import java.nio.file.Files
  import java.sql.Timestamp

  private def ts(minutes: Long) = new Timestamp(minutes * 60000L)

  test("windowed KMV merges across micro-batches and survives restart") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("kmv-src").toString
    val outDir = Files.createTempDirectory("kmv-out").toString
    val ckptDir = Files.createTempDirectory("kmv-ckpt").toString
    def append(rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "h").coalesce(1).write.mode("append").parquet(srcDir)
    val k = 4
    def startQuery() = {
      val stream = spark.readStream
        .schema("ts timestamp, h bigint")
        .option("maxFilesPerTrigger", "1") // several micro-batches per run
        .parquet(srcDir)
      graft.operators.WindowedAgg.tumbling(stream, "ts", "5 minutes",
          "10 minutes", Seq.empty,
          Seq(SketchAggregates.kmvSketch(col("h"), k).as("sk"),
            count(lit(1)).as("rows")))
        .select(col("window_start"), col("sk.n").as("n"),
          col("sk.kth").as("kth"), col("rows"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").start()
    }
    // window [0,5): 6 distinct hashes across TWO files (so partial
    // buffers must merge across micro-batches), with duplicates; one
    // negative hash pins the unsigned ordering through the state store
    append(Seq((ts(1), 50L), (ts(2), 10L), (ts(2), 10L), (ts(3), 90L)))
    append(Seq((ts(4), 20L), (ts(4), -1L), (ts(4), 70L), (ts(1), 50L)))
    // window [5,10): 2 distinct — exact regime (n < k)
    append(Seq((ts(6), 1000L), (ts(8), 2000L), (ts(8), 2000L)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    // restart from checkpoint: the buffered window state must reload;
    // ts=33 advances the watermark past both windows' ends
    append(Seq((ts(33), 7L)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(outDir)
      .select($"window_start".cast("long") / 60, $"n", $"kth", $"rows")
      .as[(Double, Int, Long, Long)].collect().toList.sortBy(_._1)
    assert(out.map(_._1) == List(0.0, 5.0),
      s"each closed window exactly once, got $out")
    // [0,5): 6 distinct of {50,10,90,20,-1,70}; k=4 smallest in
    // UNSIGNED order are 10,20,50,70 (−1 = 0xFFFF… is the largest) →
    // n == k == 4, kth == 70. Wrong signed ordering would read kth=50
    // with −1 retained.
    val w0 = out.head
    assert(w0._2 == k && w0._3 == 70L && w0._4 == 8L,
      s"window [0,5) sketch wrong: $w0")
    // [5,10): 2 < k distinct → exact n, kth = max retained = 2000
    val w5 = out(1)
    assert(w5._2 == 2 && w5._3 == 2000L && w5._4 == 3L,
      s"window [5,10) sketch wrong: $w5")
  }

  test("streaming sketch equals the batch sketch on the same rows") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("kmv-eq-src").toString
    val outDir = Files.createTempDirectory("kmv-eq-out").toString
    val ckptDir = Files.createTempDirectory("kmv-eq-ckpt").toString
    val k = 8
    // 40 hashes with collisions, deterministic scramble
    val rows = (0 until 40).map(i => (ts(i % 4), (i.toLong * 2654435761L) % 23L))
    rows.grouped(10).foreach { g =>
      g.toDF("ts", "h").coalesce(1).write.mode("append").parquet(srcDir)
    }
    val stream = spark.readStream.schema("ts timestamp, h bigint")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    // 10-minute delay: the four files process in arbitrary order and
    // every row must survive (a 0s watermark would drop earlier-ts rows
    // arriving after a later file advanced it)
    val q = graft.operators.WindowedAgg.tumbling(stream, "ts", "5 minutes",
        "10 minutes", Seq.empty,
        Seq(SketchAggregates.kmvSketch(col("h"), k).as("sk")))
      .select(col("window_start"), col("sk.n").as("n"), col("sk.kth").as("kth"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckptDir)
      .outputMode("append").start()
    q.processAllAvailable()
    // close the single [0,5) window
    Seq((ts(60), 999L)).toDF("ts", "h").coalesce(1)
      .write.mode("append").parquet(srcDir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .select($"n", $"kth").as[(Int, Long)].collect().toSet
    val batch = rows.toDF("ts", "h")
      .agg(SketchAggregates.kmvSketch(col("h"), k).as("sk"))
      .select($"sk.n", $"sk.kth").as[(Int, Long)].collect().toSet
    assert(streamed == batch,
      s"streaming merge path diverged from batch: $streamed vs $batch")
  }
}
