package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/latency measurement for the composed IVF-PQ index — routing
  * (cells-probed × cell size work per query) over PQ codes (nSub bytes
  * per vector) with exact re-rank: the FAISS production shape. Reports
  * recall@10 against the brute oracle, build/query walls, and the
  * per-query scanned fraction, so the decade table in SCALING.md can
  * show query wall SUBLINEAR in n where flat ADC (q104 / [[PqTune]])
  * scans all n codes.
  *
  * Usage: runMain graft.tools.IvfPqTune <sfDir> <nQueries> [candidates] [nProbes] [residual]
  *        (candidates defaults to max(100, n/500) — the hold-candidates/n
  *        rule PqTune's 200k row established; nProbes 0 → auto;
  *        residual=1 → FAISS-style residual codebooks, same bytes)
  */
object IvfPqTune {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = args(1).toInt
    val candidatesArg = if (args.length > 2) args(2).toInt else 0
    val probesOverride = if (args.length > 3) args(3).toInt else 0
    val residual = args.length > 4 && args(4) == "1"
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
    val candidates =
      if (candidatesArg > 0) candidatesArg else math.max(100, (n / 500).toInt)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding"))

    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Build (quantizer + codebooks + encode) timed separately from
    // query — the index is written once and served many times; the
    // number that must beat flat ADC at scale is the QUERY wall.
    val t0 = System.nanoTime()
    val (index, centroids, books) =
      Similarity.ivfPqIndex(corpus, dim, residual = residual)
    val idx = index.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    idx.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val nCells = centroids.length
    val nProbes = if (probesOverride > 0) probesOverride
                  else Similarity.probesForCells(nCells)
    val tq = System.nanoTime()
    val ivfpq = topSet(Similarity.ivfPqQuery(queries, idx, corpus,
      centroids, books, 10, candidates, nProbes, residual))
    val querySec = (System.nanoTime() - tq) / 1e9
    val t1 = System.nanoTime()
    val brute = topSet(Similarity.bruteForceTopK(queries, corpus, 10))
    val bruteSec = (System.nanoTime() - t1) / 1e9
    idx.unpersist(false)
    val recall = (ivfpq & brute).size.toDouble / brute.size
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    val scanned = nProbes.toDouble / nCells
    println(s"""{"n":$n,"dim":$dim,"cells":$nCells,"probes":$nProbes,"candidates":$candidates,"residual":$residual,"scanned_fraction":${r3(scanned)},"recall_at_10":${r3(recall)},"build_sec":${r3(buildSec)},"query_sec":${r3(querySec)},"brute_sec":${r3(bruteSec)}}""")
    spark.stop()
  }
}
