package graft.streaming

import graft.SparkTest
import graft.pings.TestMessages
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Watermark-advance emission choreography over MemoryStream for the
  * windowed pipelines — the reference drives the same dance with extra
  * batches (reference: src/test/scala/com/mozilla/telemetry/streaming/ExperimentEnrollmentsToTestTubeTest.scala:47-62,
  * T/sinks/ForeachSinkTest.scala:37-62).
  */
class StreamingSemanticsSpec extends AnyFunSuite with SparkTest {

  private val TenMinutesNs = 10L * 60 * 1000 * 1000 * 1000

  test("enrollments stream: window emits only after watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Array[Byte]]
    val query = ExperimentEnrollmentsAggregator.aggregate(input.toDF())
      .writeStream.format("memory").queryName("enroll_stream").outputMode("append").start()
    try {
      input.addData(TestMessages.eventMessages(3).map(_.toBytes))
      query.processAllAvailable()
      // append mode: nothing emitted while the window can still receive
      // late data
      assert(spark.table("enroll_stream").count() == 0)
      input.addData(TestMessages.eventMessages(1,
        timestamp = TestMessages.TestTimestampNano + TenMinutesNs).map(_.toBytes))
      query.processAllAvailable()
      val rows = spark.table("enroll_stream").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("enroll_count") == 3L)
    } finally query.stop()
  }

  test("testtube stream: JSON rows emitted on watermark advance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Array[Byte]]
    val query = ExperimentEnrollmentsToTestTube.sinkRows(input.toDF())
      .writeStream.format("memory").queryName("testtube_stream").outputMode("append").start()
    try {
      input.addData(TestMessages.eventMessages(2).map(_.toBytes))
      query.processAllAvailable()
      input.addData(TestMessages.eventMessages(1,
        timestamp = TestMessages.TestTimestampNano + TenMinutesNs).map(_.toBytes))
      query.processAllAvailable()
      val rows = spark.table("testtube_stream").as[String].collect()
      assert(rows.length == 1)
      val j = graft.json.Json.parse(rows.head)
      assert((j \ "enroll_count").asLong.contains(2L))
      assert((j \ "type").asString.contains("preference_study"))
    } finally query.stop()
  }

  test("frecency stream: offset windows + stateful sink across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clock = new graft.learning.ManualClock(1530291900000L)
    val modelDir = java.nio.file.Files.createTempDirectory("model_s").toString
    val stateDir = java.nio.file.Files.createTempDirectory("state_s").toString
    val sink = new graft.learning.FederatedLearningSink(modelDir, stateDir)
    val input = MemoryStream[Array[Byte]]
    val agg = FrecencyAggregator.aggregate(input.toDF(), "model1", clock, raiseOnError = true)
    val query = agg.writeStream
      .outputMode("append")
      .foreachBatch((ds: org.apache.spark.sql.Dataset[FrecencyUpdateAggregate], id: Long) =>
        sink.addBatch(ds, id))
      .start()
    try {
      input.addData(TestMessages.frecencyMessages(2, modelVersion = 0L).map(_.toBytes))
      query.processAllAvailable()
      // watermark is 0 minutes; advance processing-time past the window
      clock.advance(31L * 60 * 1000)
      input.addData(TestMessages.frecencyMessages(1, modelVersion = 5L).map(_.toBytes))
      query.processAllAvailable()
      clock.advance(31L * 60 * 1000)
      input.addData(TestMessages.frecencyMessages(1, modelVersion = 6L).map(_.toBytes))
      query.processAllAvailable()
      assert(sink.state.iteration >= 1L)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(modelDir, "latest.json")))
    } finally query.stop()
  }
}
