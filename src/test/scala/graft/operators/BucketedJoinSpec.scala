package graft.operators

import java.nio.file.Files

import graft.SparkTest
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins: both fact tables written bucketed by the
  * join key join WITHOUT any shuffle exchange — the pre-partitioning
  * that replaces per-query fact-fact shuffles at 100 TB (pay the
  * partitioning once at write time, amortize over every later join).
  */
class BucketedJoinSpec extends AnyFunSuite with SparkTest
    with AdaptiveSparkPlanHelper {

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    val warehouse = Files.createTempDirectory("graft-bucketed").toString
    val dir = "/root/testdata/sf0.001"
    val buckets = 8
    try {
      graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$warehouse/lineitem_b").saveAsTable("lineitem_b")
      graft.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$warehouse/orders_b").saveAsTable("orders_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val expected = graft.Tables.lineitem(spark, dir)
        .join(graft.Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)

      val executed = joined.queryExecution.executedPlan
      val shuffles = collect(executed) { case s: ShuffleExchangeLike => s }
      assert(shuffles.isEmpty,
        s"bucketed join should be shuffle-free, found: ${shuffles.map(_.nodeName)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
    }
  }
}
