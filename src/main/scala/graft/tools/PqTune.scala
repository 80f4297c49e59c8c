package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/latency measurement for trained product quantization — the
  * PQ sibling of [[IvfTune]]: trains per-subspace codebooks
  * ([[Similarity.pqTrainCodebooks]]), encodes the corpus, and runs the
  * ADC-shortlist + exact re-rank search ([[Similarity.pqTopKTrained]]'s
  * pipeline with the build timed separately) against the brute-force
  * oracle over the same queries. Reports recall@10, build/query walls,
  * and the code size per vector, so the (nSub, kPerSub, candidates)
  * dials are tuned from data (see SCALING.md "PQ at scale").
  *
  * Usage: runMain graft.tools.PqTune <sfDir> <nQueries> [nSub] [kPerSub] [candidates]
  */
object PqTune {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = args(1).toInt
    val nSub = if (args.length > 2) args(2).toInt else 16
    val kPerSub = if (args.length > 3) args(3).toInt else 64
    val candidates = if (args.length > 4) args(4).toInt else 100
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
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding"))

    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Build (codebook training + corpus encode) timed separately from
    // query: the encode IS the index a deployment writes out once.
    val t0 = System.nanoTime()
    val books = Similarity.pqTrainCodebooks(corpus, dim, nSub, kPerSub)
    val enc = Similarity.pqEncodeWith(corpus, dim, books)
      .select(col("vec_id"), col("recon").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    enc.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val tq = System.nanoTime()
    val shortlist = Similarity.bruteForceTopK(queries, enc, candidates)
      .select(col("query_id"), col("neighbor_id"))
    val raw = corpus.select(col("vec_id").as("neighbor_id"),
      graft.functions.VectorFunctions.normalize(col("embedding")).as("c_emb"))
    val qn = broadcast(queries.select(col("query_id"),
      graft.functions.VectorFunctions.normalize(col("embedding")).as("q_emb")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val pq = topSet(shortlist.join(raw, Seq("neighbor_id")).join(qn, Seq("query_id"))
      .withColumn("cosine",
        graft.functions.VectorFunctions.dot(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10))
    val querySec = (System.nanoTime() - tq) / 1e9
    val t1 = System.nanoTime()
    val brute = topSet(Similarity.bruteForceTopK(queries, corpus, 10))
    val bruteSec = (System.nanoTime() - t1) / 1e9
    enc.unpersist(false)
    val recall = (pq & brute).size.toDouble / brute.size
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    val codeBytes = nSub * (if (kPerSub <= 256) 1 else 2)
    println(s"""{"n":$n,"dim":$dim,"n_sub":$nSub,"k_per_sub":$kPerSub,"candidates":$candidates,"code_bytes":$codeBytes,"raw_bytes":${dim * 4},"recall_at_10":${r3(recall)},"build_sec":${r3(buildSec)},"query_sec":${r3(querySec)},"brute_sec":${r3(bruteSec)}}""")
    spark.stop()
  }
}
