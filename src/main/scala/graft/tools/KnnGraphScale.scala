package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mutual-kNN-graph scale measurement: wall + edge count for
  * [[graft.operators.Similarity.mutualKnnGraphAuto]] (k-means cells
  * ≈ √n, probes ≈ ⁴√n) over a corpus decade, against the label-cell
  * form where its fixed 20 cells still fit.
  *
  * Usage: runMain graft.tools.KnnGraphScale <sfDir> [k=5] [auto|label|both]
  */
object KnnGraphScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val mode = args.lift(2).getOrElse("auto")
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
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    def run(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val edges = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"quantizer":"$name","n":$n,"k":$k,"edges":$edges,"sec":${math.round(sec * 1000) / 1000.0}}""")
    }
    if (mode == "auto" || mode == "both")
      run("kmeans_auto")(graft.operators.Similarity
        .mutualKnnGraphAuto(emb, k, dim = 64).count())
    if (mode == "label" || mode == "both")
      run("label20")(graft.operators.Similarity
        .mutualKnnGraph(emb, k, dim = 64, nProbes = 2).count())
    // q142's production composition: auto graph → connected components →
    // per-community survivor + hash sample — the decade row for the
    // curation stage on top of the graph build
    if (mode == "curation")
      run("curation")(graft.operators.Graph.communityCuration(
        graft.operators.Similarity.mutualKnnGraphAuto(emb, k, dim = 64),
        "id_a", "id_b").count())
    spark.stop()
  }
}
