package graft.streaming

import java.sql.Timestamp

import graft.SparkTest
import graft.operators.Retention
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming cohort-retention gate: the per-user twin of q122's batch
  * retention. Equivalence is checked against the BATCH query aggregated
  * from the emitted (cohort, week) hits — including an out-of-order
  * arrival where the user's EARLIER week lands in the same trigger
  * after a later one (an eager cohort assignment would bucket the user
  * into the wrong cohort and mis-shift every offset).
  */
class RetentionStreamSpec extends AnyFunSuite with SparkTest {

  private val Week = 604800L
  private def tw(week: Long, offsetSec: Long = 0L): Timestamp =
    new Timestamp((week * Week + offsetSec) * 1000L)

  test("hits reproduce the batch retention, including out-of-order cohort") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // u1: weeks 1,2,4 (plus a week-2 repeat — one hit per week);
    // u2: weeks 2,3 arriving OUT OF ORDER in one trigger (3 first) —
    //     cohort must still be week 2;
    // u3: single week 1 event
    val events = Seq(
      (1L, tw(1)), (1L, tw(2)), (1L, tw(2, 60)), (1L, tw(4)),
      (2L, tw(3)), (2L, tw(2)),
      (3L, tw(1)))

    val stream = MemoryStream[(Long, Timestamp)]
    val out = Retention.streamingRetention(
      stream.toDF().toDF("user_id", "ts"),
      "user_id", "ts", watermarkDelay = "10 minutes")
    val query = out.toDF().writeStream.format("memory")
      .queryName("retention_stream").outputMode("append").start()
    try {
      stream.addData(events: _*)
      query.processAllAvailable()
      // two watermark advances: ripen everything, then fire the
      // event-time timeouts for the remainder
      stream.addData((99L, tw(100)))
      query.processAllAvailable()
      stream.addData((98L, tw(200)))
      query.processAllAvailable()

      val hits = spark.table("retention_stream").filter(col("user_id") <= 3)
      val got = hits.select("user_id", "cohort_week", "week", "week_offset")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set(
        (1L, 1L, 1L, 0L), (1L, 1L, 2L, 1L), (1L, 1L, 4L, 3L),
        (2L, 2L, 2L, 0L), (2L, 2L, 3L, 1L),
        (3L, 1L, 1L, 0L)),
        s"got $got")

      // batch-equivalence gate: aggregating the hits reproduces q122's
      // cohortRetentionEvents rows exactly (cohort sizes come from the
      // offset-0 hits — every user emits its cohort week first).
      // Rebuilt from the collected rows: the memory sink's view carries
      // one attribute set, so a self-join on it can't resolve.
      val hitRows = hits
        .select("user_id", "cohort_week", "week", "week_offset")
        .as[(Long, Long, Long, Long)].collect().toSeq
        .toDF("user_id", "cohort_week", "week", "week_offset")
      val sizes = hitRows.filter(col("week_offset") === 0)
        .groupBy(col("cohort_week"))
        .agg(countDistinct(col("user_id")).as("cohort_size"))
      val streamAgg = hitRows
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(broadcast(sizes), Seq("cohort_week"))
        .withColumn("retention_ppm",
          floor(col("n_active") * lit(1000000L) / col("cohort_size")).cast("long"))
        .select("cohort_week", "week_offset", "n_active", "cohort_size",
          "retention_ppm")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = graft.queries.QueryPack.cohortRetentionEvents(
          events.toDF("user_id", "ts"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamAgg == batch, s"stream=$streamAgg\nbatch=$batch")
    } finally query.stop()
  }

  test("late events are dropped; state is one row per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp)]
    val out = Retention.streamingRetention(
      stream.toDF().toDF("user_id", "ts"),
      "user_id", "ts", watermarkDelay = "1 minute")
    val query = out.toDF().writeStream.format("memory")
      .queryName("retention_state").outputMode("append").start()
    try {
      stream.addData((1L, tw(5)), (2L, tw(5)))
      query.processAllAvailable()
      stream.addData((3L, tw(50)))
      query.processAllAvailable()
      stream.addData((4L, tw(51)))
      query.processAllAvailable()
      // an event WAY below the watermark must be dropped — it would
      // otherwise rewrite user 1's cohort from week 5 to week 1
      stream.addData((1L, tw(1)))
      query.processAllAvailable()
      stream.addData((5L, tw(52)))
      query.processAllAvailable()
      val got = spark.table("retention_state")
        .select("user_id", "cohort_week")
        .as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 5L)) && got.contains((2L, 5L)))
      assert(!got.exists(h => h._1 == 1L && h._2 == 1L),
        "late event must not rewrite the cohort")
      val stateRows = query.lastProgress.stateOperators
        .find(_.operatorName.contains("flatMapGroupsWithState")).get.numRowsTotal
      assert(stateRows == 5, s"state must be one row per user, got $stateRows")
    } finally query.stop()
  }
}
