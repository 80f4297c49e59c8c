package graft.tools

import graft.operators.Similarity
import graft.queries.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decade measurement for the COMPOSED retrieval stack — MMR and hybrid
  * retrieval over their pluggable shortlist legs: the brute leg scans
  * 100% of the corpus per query batch (its wall is linear in n by
  * construction), the IVF-PQ leg routes through cell probes (n^(-1/4)
  * of the corpus at auto dials). This records both walls plus the
  * index-build wall (paid once, served many) and the pick agreement
  * between legs, so SCALING.md's table can show the composed QUERY wall
  * sublinear in n while the greedy/fusion arithmetic stays identical.
  *
  * Usage: runMain graft.tools.RetrievalScale <sfDir> <nQueries> [k] [shortlist]
  */
object RetrievalScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = args(1).toInt
    val k = if (args.length > 2) args(2).toInt else 5
    val shortlistSize = if (args.length > 3) args(3).toInt else 20
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

    // the served shape: index built ONCE, the leg closes over it
    val t0 = System.nanoTime()
    val (index, cents, books) = Similarity.ivfPqIndex(corpus, dim)
    val idx = index.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    idx.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    // candidates follow the hold-candidates/n rule the PqTune table
    // established (n/500, floored at 100) — a fixed small budget would
    // candidate-starve the large decade and mismeasure the composition
    val annLeg: (DataFrame, DataFrame, Int) => DataFrame =
      (q, c, sz) => Similarity.ivfPqQuery(q, idx, c, cents, books, sz,
        candidates = math.max(math.max(100, (n / 500).toInt), 2 * sz))

    def picks(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def timed[T](body: => T): (T, Double) = {
      val t = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t) / 1e9)
    }

    val (mmrAnn, mmrAnnSec) = timed(picks(
      Similarity.mmrTopK(queries, corpus, k, shortlistSize, shortlist = annLeg)))
    val (mmrBrute, mmrBruteSec) = timed(picks(
      Similarity.mmrTopK(queries, corpus, k, shortlistSize,
        shortlist = Similarity.bruteForceTopK)))
    val mmrAgree = (mmrAnn & mmrBrute).size.toDouble / math.max(1, mmrBrute.size)

    // hybrid: documents ⋈ embeddings corpus, the q107 term set
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .join(corpus.select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
    val queryTerms = spark.createDataFrame(QueryPack.Bm25Queries)
      .toDF("query_id", "t")
    val hq = queries.filter(col("query_id").isin(1L, 2L, 3L))
    def hpicks(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("doc_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (hybAnn, hybAnnSec) = timed(hpicks(
      QueryPack.hybridTopK(hq, queryTerms, docs, 10, 50, shortlist = annLeg)))
    val (hybBrute, hybBruteSec) = timed(hpicks(
      QueryPack.hybridTopK(hq, queryTerms, docs, 10, 50,
        shortlist = Similarity.bruteForceTopK)))
    val hybAgree = (hybAnn & hybBrute).size.toDouble / math.max(1, hybBrute.size)
    // the shortlist legs ALONE over the hybrid query set — separates
    // leg cost from the (leg-independent) corpus-wide BM25 stage when
    // reading the composed walls
    val docVecs = docs.select(col("doc_id").as("vec_id"), col("embedding"))
    val (_, hybAnnLegSec) = timed(
      annLeg(hq, docVecs, 50).select(col("query_id")).count())
    val (_, hybBruteLegSec) = timed(
      Similarity.bruteForceTopK(hq, docVecs, 50).select(col("query_id")).count())
    idx.unpersist(false)

    def r3(v: Double) = math.round(v * 1000) / 1000.0
    println(s"""{"n":$n,"dim":$dim,"cells":${cents.length},"queries":$nQueries,"k":$k,"shortlist":$shortlistSize,"build_sec":${r3(buildSec)},"mmr_ann_sec":${r3(mmrAnnSec)},"mmr_brute_sec":${r3(mmrBruteSec)},"mmr_agreement":${r3(mmrAgree)},"hybrid_ann_sec":${r3(hybAnnSec)},"hybrid_brute_sec":${r3(hybBruteSec)},"hybrid_agreement":${r3(hybAgree)},"hybrid_ann_leg_sec":${r3(hybAnnLegSec)},"hybrid_brute_leg_sec":${r3(hybBruteLegSec)}}""")
    spark.stop()
  }
}
