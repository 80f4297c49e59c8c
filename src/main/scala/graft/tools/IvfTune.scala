package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/latency measurement for the auto-built IVF index — the IVF
  * sibling of [[LshTune]]: runs [[Similarity.ivfTopKAuto]] (k-means
  * quantizer, nCells ≈ √n, nProbes ≈ ⁴√n) against the brute-force
  * oracle over the same queries and reports recall@10 + wall times, so
  * the cell/probe dials are tuned from data rather than guessed (see
  * SCALING.md "ANN/LSH at scale").
  *
  * Usage: runMain graft.tools.IvfTune <sfDir> <nQueries> [nProbes] [trainCap]
  *        (nProbes omitted or 0 → auto via probesForCells;
  *         trainCap omitted or 0 → auto 256·k sample, -1 → full-corpus
  *         training, else the explicit row cap — the sample-vs-full A/B)
  */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = args(1).toInt
    val probesOverride = if (args.length > 2) args(2).toInt else 0
    val trainCap = args.lift(3).map(_.toInt).getOrElse(0) match {
      case 0 => -1            // kMeans auto rule
      case -1 => Int.MaxValue // full-corpus training
      case c => c
    }
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
    val dim = corpus.select(size(col("embedding"))).first().getInt(0)
    val nCells = Similarity.cellsForCorpus(n)
    val nProbes =
      if (probesOverride > 0) probesOverride else Similarity.probesForCells(nCells)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding"))

    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Build and query timed SEPARATELY: an index build is one-time and
    // amortizes over every query served, so the number that must beat
    // brute force at scale is the QUERY wall — the build buys that rate.
    // The materialized index (cell-labeled corpus) is persisted the way
    // a real deployment writes it out once.
    val t0 = System.nanoTime()
    val (_, centroids) = Similarity.kMeans(corpus, "vec_id", "embedding",
      nCells, dim, iterations = 5, trainSampleCap = trainCap)
    val relabeled = corpus.select(col("vec_id"), col("embedding"),
        Similarity.assignCells(
          graft.functions.VectorFunctions.normalize(col("embedding")), centroids)
          .as("label"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    relabeled.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val tq = System.nanoTime()
    val ivf = topSet(Similarity.ivfTopK(queries, relabeled, 10, dim, nProbes))
    val querySec = (System.nanoTime() - tq) / 1e9
    val t1 = System.nanoTime()
    val brute = topSet(Similarity.bruteForceTopK(queries, corpus, 10))
    val bruteSec = (System.nanoTime() - t1) / 1e9
    relabeled.unpersist(false)
    val recall = (ivf & brute).size.toDouble / brute.size
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    // queries served before build+query beats all-brute-force
    val breakEven =
      if (bruteSec > querySec) math.ceil(buildSec / (bruteSec - querySec) * nQueries).toLong
      else -1L
    println(s"""{"n":$n,"cells":$nCells,"probes":$nProbes,"recall_at_10":${r3(recall)},"build_sec":${r3(buildSec)},"query_sec":${r3(querySec)},"ivf_sec":${r3(buildSec + querySec)},"brute_sec":${r3(bruteSec)},"break_even_queries":$breakEven}""")
    spark.stop()
  }
}
