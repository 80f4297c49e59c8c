package graft.streaming

import java.sql.Timestamp

import graft.SparkTest
import graft.operators.Funnel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel gate: the per-user frontier twin of q121's batch
  * funnel. Equivalence is checked against the BATCH query aggregated
  * from the emitted completions — including an out-of-order arrival the
  * watermark buffer must reorder (an eager frontier would emit the
  * wrong t1 and a wrong downstream average).
  */
class FunnelStreamSpec extends AnyFunSuite with SparkTest {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("completions reproduce the batch funnel, including out-of-order t1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // u1 completes all three steps; u2 stalls at view (its click
    // precedes the view); u3 never views; u4's two views arrive
    // OUT OF ORDER in the same trigger — t1 must be the earlier ts(5)
    val events = Seq(
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      (2L, "view", ts(10)), (2L, "click", ts(5)), (2L, "purchase", ts(32)),
      (3L, "click", ts(10)),
      (4L, "view", ts(10)), (4L, "view", ts(5)), (4L, "click", ts(12)),
      (1L, "browse", ts(11))) // non-step type: filtered map-side

    val stream = MemoryStream[(Long, String, Timestamp)]
    val out = Funnel.streamingFunnel(
      stream.toDF().toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts",
      steps = Seq("view", "click", "purchase"),
      watermarkDelay = "10 minutes")
    val query = out.toDF().writeStream.format("memory")
      .queryName("funnel_stream").outputMode("append").start()
    try {
      stream.addData(events: _*)
      query.processAllAvailable()
      // two watermark advances: the first ripens everything <= max-10min,
      // the second fires the event-time timeouts for the rest. The
      // flushes must be STEP-typed: the type filter is pushed below the
      // watermark node, so a non-step event never advances it.
      stream.addData((99L, "view", ts(10000)))
      query.processAllAvailable()
      stream.addData((98L, "view", ts(20000)))
      query.processAllAvailable()

      val comp = spark.table("funnel_stream").filter(col("user_id") <= 4)
      val got = comp.select("user_id", "step_idx", "t1", "tk")
        .as[(Long, Int, Timestamp, Timestamp)].collect().toSet
      assert(got == Set(
        (1L, 1, ts(10), ts(10)), (1L, 2, ts(10), ts(20)), (1L, 3, ts(10), ts(30)),
        (2L, 1, ts(10), ts(10)),
        (4L, 1, ts(5), ts(5)), (4L, 2, ts(5), ts(12))),
        s"got $got")

      // batch-equivalence gate: aggregating the completions reproduces
      // q121's funnelSteps rows exactly
      val streamAgg = comp
        .groupBy(col("step_idx").cast("long").as("step_idx"), col("step"))
        .agg(count(lit(1)).as("n_users"),
          avg((col("tk").cast("long") - col("t1").cast("long")).cast("double"))
            .as("avg_secs_from_start"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      val batch = graft.queries.QueryPack.funnelSteps(
          events.toDF("user_id", "event_type", "ts"),
          Seq("view", "click", "purchase"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(streamAgg == batch, s"stream=$streamAgg\nbatch=$batch")
    } finally query.stop()
  }

  test("frontier state is one row per user; late events are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, String, Timestamp)]
    val out = Funnel.streamingFunnel(
      stream.toDF().toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts",
      steps = Seq("view", "click"), watermarkDelay = "1 minute")
    val query = out.toDF().writeStream.format("memory")
      .queryName("funnel_state").outputMode("append").start()
    try {
      stream.addData((1L, "view", ts(10)), (2L, "view", ts(10)))
      query.processAllAvailable()
      stream.addData((3L, "view", ts(1000)))
      query.processAllAvailable()
      stream.addData((4L, "view", ts(1001)))
      query.processAllAvailable()
      // a click WAY below the watermark (999 min) must be dropped, not
      // advance user 1 (its view completed at the ts(1000) ripening)
      stream.addData((1L, "click", ts(11)))
      query.processAllAvailable()
      stream.addData((5L, "view", ts(1002)))
      query.processAllAvailable()
      val got = spark.table("funnel_state")
        .select("user_id", "step_idx")
        .as[(Long, Int)].collect().toSet
      assert(got.contains((1L, 1)) && got.contains((2L, 1)))
      assert(!got.contains((1L, 2)), "late click must not advance the funnel")
      // state: one frontier row per user seen (1..5), buffers drained
      // for every user at or below the watermark
      val stateRows = query.lastProgress.stateOperators
        .find(_.operatorName.contains("flatMapGroupsWithState")).get.numRowsTotal
      assert(stateRows == 5, s"state must be one frontier row per user, got $stateRows")
    } finally query.stop()
  }
}
