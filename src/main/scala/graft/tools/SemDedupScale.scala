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
  * Mode `planted` / `plantedtwo` measures recall in semantic dedup's
  * DESIGNED regime (near-identical duplicates, the published SemDeDup
  * use case): every 10th corpus vector gets an ε-perturbed copy
  * (alternating-sign offset scaled to ~cosine 0.97, spreading
  * 0.95–0.99 with the vector's own geometry), the TRUTH set is the
  * planted pairs whose exact cosine clears the threshold, and recall
  * is the fraction of those whose copy the operator actually drops.
  * This complements the τ=0.4 background-level table (which measures
  * the cross-cluster loss SemDeDup trades away) with the number that
  * matters in production: near-identical recall.
  *
  * Usage: runMain graft.tools.SemDedupScale <sfDir> [threshold]
  *        [targetCellSize] [bruteMaxN] [mode: single|twolevel|planted|plantedtwo]
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

    if (mode == "planted" || mode == "plantedtwo") {
      import graft.functions.VectorFunctions
      val offset = 100000000L
      // ε-perturbed copies of every 10th vector: v' = v + 0.25·|v|·u/|u|
      // with u the alternating ±1 pattern (|u| = √dim) → cosine ≈
      // 1/√(1+0.25²) ≈ 0.970 when u ⊥ v, spreading 0.95–0.99 as u·v
      // varies with each vector's geometry
      // arg 6 = perturbation scale s (cosine ≈ 1/√(1+s²)): 0.10 → 0.995
      // (near-identical, the designed regime), 0.25 → 0.970 (stress —
      // exposes the quantizer's boundary-split miss rate)
      val epsScale = if (args.length > 5) args(5).toDouble else 0.10
      // arg 7 = assignProbes (1 = nearest cell, 2 = top-2 multi-assign)
      val probes = if (args.length > 6) args(6).toInt else 1
      val eps = epsScale / math.sqrt(dim.toDouble)
      def perturb(v: org.apache.spark.sql.Column) =
        graft.functions.TextFunctions.bind(VectorFunctions.norm(v)) { nm =>
          zip_with(v, sequence(lit(0), lit(dim - 1)), (x, i) =>
            x + lit(eps) * nm * when(i % 2 === 0, 1.0).otherwise(-1.0))
        }
      val base = corpus.filter(col("vec_id") % 10 === 0)
      val planted = base.select((col("vec_id") + offset).as("vec_id"),
        perturb(col("embedding")).as("embedding"))
      val full = corpus.unionByName(planted)
      // truth: planted pairs whose EXACT cosine clears the threshold
      val pairCos = base.select(col("vec_id"),
          VectorFunctions.normalize(col("embedding")).as("e1"))
        .join(planted.select((col("vec_id") - offset).as("vec_id"),
          VectorFunctions.normalize(col("embedding")).as("e2")), Seq("vec_id"))
        .select(col("vec_id"), VectorFunctions.dot(col("e1"), col("e2")).as("cos"))
        .cache()
      val truth = pairCos.filter(col("cos") >= threshold)
        .select((col("vec_id") + offset).as("vec_id")).cache()
      val nTruth = truth.count()
      val t0 = System.nanoTime()
      val survivors =
        (if (mode == "plantedtwo")
           Similarity.semanticDedupTwoLevel(full, dim, threshold, targetCell,
             assignProbes = probes)
         else Similarity.semanticDedupAuto(full, dim, threshold, targetCell,
           assignProbes = probes))
          .select("vec_id").cache()
      val nSurv = survivors.count()
      val tWall = (System.nanoTime() - t0) / 1e9
      val droppedTruth = nTruth - truth.join(survivors, Seq("vec_id")).count()
      val recall = if (nTruth == 0) 0.0 else droppedTruth.toDouble / nTruth
      println(
        s"""{"metric":"semdedup_planted","mode":"$mode","n":$n,"n_planted":${planted.count()},"eps_scale":$epsScale,"probes":$probes,"threshold":$threshold,"truth_pairs":$nTruth,"dropped":$droppedTruth,"recall":${f"$recall%.4f"},"survivors":$nSurv,"wall_sec":${f"$tWall%.2f"}}""")
      spark.stop()
      return
    }

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
