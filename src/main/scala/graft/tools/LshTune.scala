package graft.tools

import graft.operators.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Banding-dial measurement for the embedding near-dup LSH: times one
  * (nPlanes, nTables) configuration over a corpus and reports pair count
  * + wall time + TOTAL SHUFFLE BYTES WRITTEN, so the occupancy/recall/
  * bytes tradeoff is tuned from data rather than guessed (see SCALING.md
  * "ANN/LSH at scale" and "LSH near-dup at 2M").
  *
  * Usage: runMain graft.tools.LshTune <sfDir> <threshold> <nPlanes> <nTables>
  *        nPlanes = 0 → auto via planesForCorpus
  *        nTables = "auto" → the full budget-dispatched
  *                  [[Similarity.cosineNearDupLshAuto]] path (the call a
  *                  production pipeline makes), optional 5th arg = budget
  *                  bytes (default [[Similarity.DefaultLshShuffleBudgetBytes]])
  *        nTables = "ids:<t>" → the ids-only layout at t tables
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val Array(dir, thresholdS, planesS, tablesS) = args.take(4)
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
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = corpus.count()
    val threshold = thresholdS.toDouble
    val planes =
      if (planesS.toInt == 0) Similarity.planesForCorpus(n) else planesS.toInt
    val t0 = System.nanoTime()
    // in auto mode the dispatcher derives planes itself
    // (planesForCorpus) — report THAT value, never a passed dial the
    // run ignored, or the recorded evidence row misstates the config
    var planesRan = planes
    val (mode, pairs) = tablesS match {
      case "auto" =>
        val budget = args.lift(4).map(_.toLong)
          .getOrElse(Similarity.DefaultLshShuffleBudgetBytes)
        planesRan = Similarity.planesForCorpus(n)
        ("auto", Similarity.cosineNearDupLshAuto(corpus, threshold,
          shuffleByteBudget = budget).count())
      case s if s.startsWith("ids:") =>
        ("ids", Similarity.cosineNearDupLshIdsOnly(corpus, threshold,
          planes, s.drop(4).toInt).count())
      case s =>
        ("vec", Similarity.cosineNearDupLsh(corpus, threshold, planes, s.toInt).count())
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"n":$n,"mode":"$mode","planes":$planesRan,"tables":"$tablesS","pairs":$pairs,"sec":${math.round(sec * 1000) / 1000.0},"shuffle_bytes":${shuffleBytes.get()}}""")
    spark.stop()
  }
}
