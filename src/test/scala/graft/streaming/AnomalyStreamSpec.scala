package graft.streaming

import java.sql.Timestamp

import graft.SparkTest
import graft.operators.Anomaly
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming anomaly gate: the per-type twin of q138's batch Poisson-z
  * test. Equivalence is checked against `eventAnomaliesCore` on the
  * same corpus, with a planted spike, a flat control type, and
  * out-of-order day arrival inside one trigger (an eager per-batch
  * test would score day 8 against an incomplete day-6 baseline).
  */
class AnomalyStreamSpec extends AnyFunSuite with SparkTest {

  private val Day = 86400L
  private def td(day: Long, offsetSec: Long = 0L): Timestamp =
    new Timestamp((day * Day + offsetSec) * 1000L)

  // click: 10/day on days 1..7, then a 50-event spike on day 8;
  // view: flat 10/day on days 1..8 (control — never flagged).
  // Day-8 click events arrive BEFORE day 6's in the same trigger.
  private def corpus: Seq[(String, Timestamp)] = {
    def burst(t: String, day: Long, n: Int) =
      (0 until n).map(i => (t, td(day, i.toLong)))
    burst("click", 8, 50) ++
      (1L to 5L).flatMap(d => burst("click", d, 10)) ++
      burst("click", 7, 10) ++ burst("click", 6, 10) ++
      (1L to 8L).flatMap(d => burst("view", d, 10))
  }

  test("streamed hits reproduce the batch anomaly rows exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(String, Timestamp)]
    val out = Anomaly.streamingAnomalies(
      stream.toDF().toDF("event_type", "ts"),
      "event_type", "ts", watermarkDelay = "10 minutes")
    val query = out.toDF().writeStream.format("memory")
      .queryName("anomaly_stream").outputMode("append").start()
    try {
      stream.addData(corpus: _*)
      query.processAllAvailable()
      // ripen everything, then fire the event-time timeouts
      stream.addData(("sentinel", td(100)))
      query.processAllAvailable()
      stream.addData(("sentinel", td(200)))
      query.processAllAvailable()

      val got = spark.table("anomaly_stream")
        .filter(col("event_type") =!= "sentinel")
        .select("event_type", "d", "n", "sum7", "cnt7")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      // batch equivalence on the identical corpus
      val batch = graft.queries.QueryPack.eventAnomaliesCore(
          corpus.toDF("event_type", "ts"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got == batch, s"stream=$got\nbatch=$batch")
      // and the planted spike is the single flagged row
      assert(got == Set(("click", 8L, 50L, 70L, 7L)))
    } finally query.stop()
  }

  test("late events are dropped; state is one trimmed row per type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(String, Timestamp)]
    val out = Anomaly.streamingAnomalies(
      stream.toDF().toDF("event_type", "ts"),
      "event_type", "ts", watermarkDelay = "1 minute")
    val query = out.toDF().writeStream.format("memory")
      .queryName("anomaly_state").outputMode("append").start()
    try {
      stream.addData((1L to 7L).map(d => ("click", td(d))): _*)
      query.processAllAvailable()
      stream.addData(("click", td(50)))
      query.processAllAvailable()
      // a day-8 event arriving with the watermark at day 50 is LATE:
      // admitting it would test a day the baseline already sealed past
      stream.addData(("click", td(8)))
      query.processAllAvailable()
      stream.addData(("click", td(60)))
      query.processAllAvailable()
      val flagged = spark.table("anomaly_state")
        .filter(col("d") === 8L).count()
      assert(flagged == 0L, "late day-8 event must be dropped, not tested")
      val stateRows = query.lastProgress.stateOperators
        .find(_.operatorName.contains("flatMapGroupsWithState")).get.numRowsTotal
      assert(stateRows == 1, s"state must be one row per type, got $stateRows")
    } finally query.stop()
  }
}
