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

  test("windowed stream recovers from checkpoint without loss or duplication") {
    // exactly-once across a restart: run a file-source windowed count,
    // stop the query, append more data, restart from the SAME
    // checkpoint — every closed window must appear exactly once
    import java.nio.file.Files
    import java.sql.Timestamp
    import org.apache.spark.sql.functions._
    val srcDir = Files.createTempDirectory("graft-ckpt-src").toString
    val outDir = Files.createTempDirectory("graft-ckpt-out").toString
    val ckptDir = Files.createTempDirectory("graft-ckpt-state").toString
    import spark.implicits._
    def ts(minutes: Long) = new Timestamp(minutes * 60000L)
    def append(rows: Seq[(Timestamp, String)]): Unit =
      rows.toDF("ts", "event_type").coalesce(1)
        .write.mode("append").parquet(srcDir)
    def startQuery() = {
      val stream = spark.readStream
        .schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1") // several micro-batches per run
        .parquet(srcDir)
      // 10-minute watermark delay: within run 1 the two seed files may
      // process in either mtime order; the delay must exceed their max
      // timestamp gap so neither order drops the other file as late
      graft.operators.WindowedAgg.tumbling(stream, "ts", "5 minutes",
          "10 minutes", Seq(col("event_type")), Seq(count(lit(1)).as("n")))
        .select(col("window_start"), col("event_type"), col("n"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").start()
    }
    // window [0,5): 3 clicks; [5,10): 2 views
    append(Seq((ts(1), "click"), (ts(2), "click"), (ts(4), "click")))
    append(Seq((ts(6), "view"), (ts(8), "view")))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    // restart from checkpoint; new data closes the earlier windows
    // (watermark = max ts − 10 min must pass each window's end)
    append(Seq((ts(12), "click"), (ts(13), "click")))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    // third run: advance far enough to close [10,15) as well
    append(Seq((ts(30), "view")))
    val q3 = startQuery()
    q3.processAllAvailable()
    q3.stop()
    val out = spark.read.parquet(outDir)
      .select($"window_start".cast("long"), $"event_type", $"n")
      .as[(Long, String, Long)].collect().toList
    // no window/event_type pair may be emitted twice across restarts
    assert(out.size == out.map(r => (r._1, r._2)).distinct.size,
      s"duplicate window emissions: $out")
    val byWindow = out.map { case (w, e, n) => (w / 60, e) -> n }.toMap
    assert(byWindow((0L, "click")) == 3L)
    assert(byWindow((5L, "view")) == 2L)
    assert(byWindow((10L, "click")) == 2L)
  }

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
