package graft.tools

import graft.operators.Sessionize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming throughput measurement over the graft-synth DSv2 source —
  * the streaming-side complement to `graft.Bench` (which times batch
  * queries only). Each pipeline consumes a bounded deterministic
  * stream through `processAllAvailable` and reports end-to-end input
  * rows/sec at local[N], micro-batch overhead included:
  *
  *  - `source`:   source → project → noop sink (framework floor)
  *  - `window`:   source → 5-min tumbling windowed count (watermark
  *                1 min, append) — the reference's ErrorAggregator
  *                shape (BASELINE.md §A)
  *  - `session`:  source → flatMapGroupsWithState sessionization,
  *                50k-key churn-heavy profile (every event exceeds its
  *                user's gap → constant open/close/emit traffic)
  *  - `dedup`:    source → watermark-bounded dropDuplicates (50% dup
  *                key rate)
  *  - `curation`: source → text synthesis (50% duplicate docs) →
  *                [[graft.pipelines.CurationPipeline.curateStream]]
  *                (normalize → watermarked dedup → quality filter →
  *                hash split) — the full per-document stage chain
  *
  * `GRAFT_ROCKSDB_STATE=1` swaps the state-store provider to RocksDB +
  * changelog checkpointing (same flag the jobs honor) for an A/B of
  * the state-store tax: HDFS keeps every key on heap, RocksDB spills
  * to local disk — the provider a 100 TB deployment needs once state
  * outgrows executor memory. `sessionKeys` sizes the sessionization /
  * dedup key space (state rows), the dial the tax depends on.
  *
  * Usage: runMain graft.tools.StreamBench [totalRows] [rowsPerBatch] [sessionKeys]
  * Prints one JSON line: {"rows":N,"pipelines":{name:rows_per_sec,…}}
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val totalRows = if (args.length > 0) args(0).toLong else 2000000L
    val rowsPerBatch = if (args.length > 1) args(1).toLong else 250000L
    val sessionKeys = if (args.length > 2) args(2).toLong else 50000L
    val rocksDb = graft.streaming.StreamingJobBase.envFlag("GRAFT_ROCKSDB_STATE")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.streaming.StreamingJobBase.rocksDbStateConfs(rocksDb)
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.codegen.hugeMethodLimit", "8000")) {
        case (b, (k, v)) => b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def source() = spark.readStream.format("graft-synth")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("maxRows", totalRows.toString)
      .option("numPartitions", cpus)
      .load()

    def time(name: String)(df: org.apache.spark.sql.DataFrame): (String, Double) = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"sb-$name").toString
      val t0 = System.nanoTime()
      val q = df.writeStream.format("noop")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      name -> totalRows / sec
    }

    val results = Seq(
      time("source") {
        source().select($"offset", length($"value").as("n"))
      },
      time("window") {
        source().withWatermark("ts", "1 minute")
          .groupBy(window($"ts", "5 minutes"))
          .agg(count(lit(1)).as("n"))
          .select($"window.start".as("w"), $"n")
      },
      time("session") {
        Sessionize.streamingSessions(
          source().select(($"offset" % sessionKeys).as("user_id"), $"ts")
            .as[Sessionize.UserEvent],
          gapSeconds = 60L, watermarkDelay = "1 minute").toDF()
      },
      time("dedup") {
        source().withWatermark("ts", "1 minute")
          .select(($"offset" / 2L).cast("long").as("k"), $"ts")
          .dropDuplicatesWithinWatermark("k")
      },
      time("curation") {
        // synthesized documents: 50% exact-duplicate texts (offset/2
        // collapses pairs), enough tokens for the quality/normalize
        // passes to do real per-row work
        graft.pipelines.CurationPipeline.curateStream(
          source().select($"ts", concat(
            lit("the quick brown fox jumps over the lazy dog entry "),
            ($"offset" / 2L).cast("string")).as("text")),
          tsCol = "ts", watermarkDelay = "1 minute")
      })

    def r0(v: Double): Long = math.round(v)
    val js = results.map { case (k, v) => s"\"$k\":${r0(v)}" }.mkString(",")
    println(s"""{"rows":$totalRows,"rows_per_batch":$rowsPerBatch,"cpus":$cpus,"session_keys":$sessionKeys,"rocksdb":$rocksDb,"pipelines_rows_per_sec":{$js}}""")
    spark.stop()
  }
}
