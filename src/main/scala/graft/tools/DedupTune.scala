package graft.tools

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Byte-estimate calibration for the MinHash and SimHash near-dup
  * families — the [[LshTune]] protocol: run one configuration over a
  * corpus, record pair count + wall + measured shuffle bytes (task-
  * metrics listener) NEXT TO the raw-byte estimate the auto dials use
  * (`minhashBandExchangeBytes` / `simhashBlockedExchangeBytes`), so the
  * estimators are validated against one real measurement each instead
  * of trusted (see SCALING.md "Budget dials for the MinHash/SimHash
  * families"). Estimates are raw; the wire is lz4 — the recorded ratio
  * IS the calibration.
  *
  * Usage: runMain graft.tools.DedupTune <sfDir> minhash <bands|auto> [budgetBytes]
  *        runMain graft.tools.DedupTune <sfDir> simhash <nBlocks|auto> [budgetBytes]
  */
object DedupTune {
  def main(args: Array[String]): Unit = {
    val Array(dir, family, dialS) = args.take(3)
    val budget = args.lift(3).map(_.toLong)
      .getOrElse(graft.operators.Similarity.DefaultLshShuffleBudgetBytes)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val pre = docs.agg(count(lit(1)),
      avg(size(graft.functions.TextFunctions.shingleHashes(col("text"), 3)))).first()
    val n = pre.getLong(0)
    val avgSh = if (pre.isNullAt(1)) 0.0 else pre.getDouble(1)
    shuffleBytes.set(0L) // pre-pass excluded from the measurement

    val t0 = System.nanoTime()
    val (dial, estimate, pairs) = family match {
      case "minhash" =>
        val b = if (dialS == "auto")
          Dedup.minhashBandsForBudget(n, 4, avgSh, budget)
        else dialS.toInt
        val est = Dedup.minhashBandExchangeBytes(n, b, avgSh)
        val p = Dedup.nearDuplicatePairs(docs, "doc_id", "text",
          numHashes = 4 * b, bands = b).count()
        (b, est, p)
      case "simhash" =>
        val nb = if (dialS == "auto")
          Seq(4, 8).minBy(x => (Dedup.simhashBlockedExchangeBytes(n, x, 7), x))
        else dialS.toInt
        val est = Dedup.simhashBlockedExchangeBytes(n, nb, 7)
        val sig = Dedup.simHash(docs, "text")
          .filter(size(graft.functions.TextFunctions.tokens(col("text"))) > 0)
          .select(col("doc_id"), col("simhash"))
        val p = Dedup.hammingNearDupsBlocked(sig, "doc_id", "simhash", 7, nb).count()
        (nb, est, p)
      case other => sys.error(s"unknown family $other")
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val measured = shuffleBytes.get()
    val ratio = if (measured > 0) estimate.toDouble / measured else -1.0
    println(s"""{"family":"$family","n":$n,"avg_shingles":${math.round(avgSh * 10) / 10.0},"dial":$dial,"estimate_raw_bytes":$estimate,"measured_shuffle_bytes":$measured,"raw_over_wire":${math.round(ratio * 100) / 100.0},"pairs":$pairs,"sec":${math.round(sec * 1000) / 1000.0}}""")
    spark.stop()
  }
}
