package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Banding-dial measurement for the embedding near-dup LSH: times one
  * (nPlanes, nTables) configuration over a corpus and reports pair count
  * + wall time, so the occupancy/recall tradeoff is tuned from data
  * rather than guessed (see SCALING.md "ANN/LSH at scale").
  *
  * Usage: runMain graft.tools.LshTune <sfDir> <threshold> <nPlanes> <nTables>
  *        (nPlanes = 0 → auto via planesForCorpus)
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
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = corpus.count()
    val planes =
      if (planesS.toInt == 0) Similarity.planesForCorpus(n) else planesS.toInt
    val t0 = System.nanoTime()
    val pairs = Similarity.cosineNearDupLsh(
      corpus, thresholdS.toDouble, planes, tablesS.toInt).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"n":$n,"planes":$planes,"tables":${tablesS.toInt},"pairs":$pairs,"sec":${math.round(sec * 1000) / 1000.0}}""")
    spark.stop()
  }
}
