package graft.streaming

import java.sql.Timestamp

import graft.SparkTest
import graft.operators.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked stream-stream interval join over MemoryStream twins. */
class StreamJoinSpec extends AnyFunSuite with SparkTest {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("clicks join the impression within the interval; stale ones don't") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val impressions = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoins.joinWithinInterval(
      clicks.toDF().toDF("click_ad", "click_ts"),
      impressions.toDF().toDF("imp_ad", "imp_ts"),
      leftKey = "click_ad", rightKey = "imp_ad",
      leftTs = "click_ts", rightTs = "imp_ts",
      watermarkDelay = "1 minute", intervalSeconds = 600L)
    val query = joined.writeStream.format("memory")
      .queryName("stream_join").outputMode("append").start()
    try {
      // ad 1 impressed at t=10; clicked at t=15 (within 10 min) → joins.
      // ad 2 impressed at t=10; clicked at t=25 (stale) → dropped.
      // ad 3 clicked at t=15 with no impression → dropped (inner join).
      impressions.addData((1L, ts(10)), (2L, ts(10)))
      clicks.addData((1L, ts(15)), (2L, ts(25)), (3L, ts(15)))
      query.processAllAvailable()
      val rows = spark.table("stream_join")
        .select("click_ad", "imp_ad").as[(Long, Long)].collect().toSet
      assert(rows == Set((1L, 1L)))
    } finally query.stop()
  }
}
