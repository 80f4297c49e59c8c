package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the production semantic-dedup path
  * ([[Similarity.semanticDedupAuto]]): k-means quantizer sized for
  * bounded cluster cost (k = ⌈n/targetCellSize⌉), prune inside the
  * cluster join. Reports build (k-means) and prune walls separately —
  * the build amortizes over reuses of the quantizer (the same
  * centroids serve IVF search and repeated incremental dedup runs) —
  * plus survivor counts, and for small corpora a recall check against
  * the quadratic global brute force (clustering can only MISS
  * cross-cluster pairs, so survivors(auto) ⊇ survivors(brute); the
  * miss rate is the price of linearity, exactly SemDeDup's published
  * trade).
  *
  * Mode `twolevel` measures [[Similarity.semanticDedupTwoLevel]] (the
  * ≥1M-vector build: n^1.5 work instead of n², sub-centroids in a
  * DataFrame instead of a plan literal) end-to-end against the same
  * corpus and threshold, so the two builds' survivor counts and walls
  * sit side by side in SCALING.md.
  *
  * Usage: runMain graft.tools.SemDedupScale <sfDir> [threshold]
  *        [targetCellSize] [bruteMaxN] [mode: single|twolevel]
  */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.4
    val targetCell = if (args.length > 2) args(2).toInt else 512
    val bruteMaxN = if (args.length > 3) args(3).toLong else 20000L
    val mode = if (args.length > 4) args(4) else "single"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = corpus.count()
    val dim = corpus.select(size(col("embedding"))).first().getInt(0)
    val k = math.max(1, math.ceil(n.toDouble / targetCell).toInt)

    if (mode == "twolevel") {
      val t0 = System.nanoTime()
      val survivors = Similarity
        .semanticDedupTwoLevel(corpus, dim, threshold, targetCell)
        .count()
      val tTotal = (System.nanoTime() - t0) / 1e9
      val k1 = math.max(1, math.round(math.sqrt(k.toDouble)).toInt)
      println(
        s"""{"metric":"semdedup_twolevel","n":$n,"k":$k,"k1":$k1,"threshold":$threshold,"target_cell":$targetCell,"total_sec":${f"$tTotal%.2f"},"survivors":$survivors}""")
      spark.stop()
      return
    }

    // build (k-means) timed apart from the prune join it feeds
    val t0 = System.nanoTime()
    val (assign, _) =
      Similarity.kMeans(corpus, "vec_id", "embedding", k, dim, iterations = 3)
    val clustered = corpus.join(assign, Seq("vec_id")).cache()
    val nClustered = clustered.count()
    val tBuild = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val survivors = Similarity
      .semanticDedup(clustered, "cell", threshold, clusterCountHint = k)
      .count()
    val tPrune = (System.nanoTime() - t1) / 1e9

    // recall vs the quadratic global brute force, affordable-small only
    val bruteLine = if (n <= bruteMaxN) {
      val t2 = System.nanoTime()
      val bruteSurvivors = Similarity.semanticDedup(
        corpus.withColumn("one", lit(0)), "one", threshold,
        clusterCountHint = 1).count()
      val tBrute = (System.nanoTime() - t2) / 1e9
      val missed = survivors - bruteSurvivors
      s""","brute_survivors":$bruteSurvivors,"brute_sec":${f"$tBrute%.2f"},"missed_cross_cluster_dups":$missed"""
    } else ""

    println(
      s"""{"metric":"semdedup","n":$n,"n_clustered":$nClustered,"k":$k,"threshold":$threshold,"target_cell":$targetCell,"build_sec":${f"$tBuild%.2f"},"prune_sec":${f"$tPrune%.2f"},"survivors":$survivors$bruteLine}""")
    spark.stop()
  }
}
