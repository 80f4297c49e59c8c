package graft.queries

import org.apache.spark.sql.SparkSession

/** Plan audit: prints formatted physical plans for representative queries
  * so pushdown/broadcast/codegen properties can be inspected
  * (`Test/runMain graft.queries.PlanCheck [query ...]`).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // match Bench/Verify codegen fallback regime
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    // q20/q22/q32 are OMITTED from the defaults: their operators eagerly
    // materialize the candidate set (localCheckpoint), so "building" the
    // DataFrame runs the pipeline and the printed plan is a trivial
    // checkpoint scan — audit those plans inside Dedup instead.
    val targets = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_region_revenue", "q03_join_priority",
        "q04_topk_orders", "q10_event_window_sum", "q42_asof_join")
    targets.foreach { name =>
      println(s"===== $name =====")
      println(QueryPack.all(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
