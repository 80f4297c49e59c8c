package graft.monitoring

import graft.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ObservedMetricsSpec extends AnyFunSuite with SparkTest {

  test("batch: observed metrics arrive via QueryExecutionListener, computed in-plan") {
    import spark.implicits._
    val collector = new ObservedMetrics.Collector
    spark.listenerManager.register(collector)
    try {
      val df = Seq((1L, "ok"), (2L, "ok"), (3L, "err")).toDF("id", "status")
      val observed = ObservedMetrics.attach(df, "parse_stats",
        count(lit(1)).as("rows"),
        count(when($"status" === "err", 1)).as("errors"))
      observed.write.mode("overwrite").format("noop").save()
      // listener delivery is async relative to the action
      var row = collector.get("parse_stats")
      val deadline = System.nanoTime() + 10_000_000_000L
      while (row.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(50); row = collector.get("parse_stats")
      }
      assert(row.isDefined, "observed metrics never arrived")
      assert(row.get.getAs[Long]("rows") == 3L)
      assert(row.get.getAs[Long]("errors") == 1L)
    } finally spark.listenerManager.unregister(collector)
  }

  test("streaming: observed metrics surface in per-batch progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val observed = ObservedMetrics.attach(input.toDF().toDF("v"), "stream_stats",
      count(lit(1)).as("rows"), sum($"v").as("sum_v"))
    val query = observed.writeStream.format("noop").start()
    try {
      input.addData(1L, 2L, 3L)
      query.processAllAvailable()
      val m = query.lastProgress.observedMetrics.get("stream_stats")
      assert(m != null, "expected observed metrics in the progress")
      assert(m.getAs[Long]("rows") == 3L && m.getAs[Long]("sum_v") == 6L)
    } finally query.stop()
  }
}
