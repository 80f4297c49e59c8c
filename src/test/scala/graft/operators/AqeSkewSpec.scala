package graft.operators

import graft.SparkTest
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins SCALING.md's "AQE covers residual hot buckets" claim: with a
  * deliberately skewed join key and test-scaled skew thresholds, AQE's
  * runtime re-plan must actually split the hot partition — asserted
  * from the executed plan, not assumed. (Deterministic salting in
  * [[Skew]] covers first-stage aggregation skew; this spec covers the
  * join-side mitigation the engine delegates to AQE.)
  */
class AqeSkewSpec extends AnyFunSuite with SparkTest with AdaptiveSparkPlanHelper {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    val confs = Map(
      // scale the 256MB-class production thresholds down to test data
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // forbid the broadcast escape hatch so the join stays sort-merge
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of left rows share key 0 (with a wide payload so the hot
      // partition crosses the threshold); right side is uniform
      val left = spark.range(0, 60000)
        .select(when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"),
          concat(lit("x" * 64), $"id").as("payload"))
      val right = spark.range(0, 2000).select($"id".as("k"), lit(1L).as("w"))
      val joined = left.join(right, "k")
      // collect() (not count()) drives THIS Dataset's QueryExecution, so
      // the AQE plan below is the finalized one
      assert(joined.collect().length == 54000 + 200) // key-0 rows + uniform hits
      val plan = joined.queryExecution.executedPlan
      val smj = collectWithSubqueries(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, s"expected a sort-merge join in:\n$plan")
      assert(smj.exists(_.isSkewJoin),
        s"AQE did not mark the skewed join (isSkewJoin=false) in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
