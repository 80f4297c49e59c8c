package graft.streaming

import graft.pings.TestMessages
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

/** Manual drive: event-ping explode as a real streaming query writing
  * partitioned parquet (`Test/runMain graft.streaming.DemoEventJobs`).
  */
object DemoEventJobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val out = Files.createTempDirectory("events_out").toString
    val checkpoint = Files.createTempDirectory("events_ckpt").toString
    val input = MemoryStream[Array[Byte]]
    val query = EventPingEvents.explodeEvents(input.toDF())
      .withColumn("submission_date_s3", org.apache.spark.sql.functions.lit("20160407"))
      .repartition(1)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", checkpoint)
      .partitionBy("submission_date_s3")
      .start()
    input.addData(TestMessages.eventMessages(5).map(_.toBytes))
    query.processAllAvailable()
    query.stop()

    val written = spark.read.parquet(out)
    written.select("event_category", "event_method", "event_process", "submission_date_s3")
      .show(25, truncate = false)
    println("DRIVE-EVENT-ROWS=" + written.count())

    val enrollments = ExperimentEnrollmentsAggregator.aggregate(
      spark.createDataset(TestMessages.eventMessages(4).map(_.toBytes)).toDF("value"))
    enrollments.show(5, truncate = false)
    println("DRIVE-ENROLL-ROWS=" + enrollments.count())

    val config = graft.amplitude.AmplitudeConfig.parse(
      new String(getClass.getResourceAsStream("/amplitudeTestConfig.json").readAllBytes()))
    val transport = new graft.sinks.RecordingTransport(Seq(200))
    val amplitudeSink = graft.sinks.AmplitudeHttpSink("DEMO-KEY", "http://example.test/batch",
      graft.sinks.HttpSink.Config(transport = transport, sleeper = _ => ()))
    val payloads = EventsToAmplitude.getEvents(config,
      spark.createDataset(TestMessages.focusEventMessages(3).map(_.toBytes)).toDF("value"),
      sample = 1.0, raiseOnError = true)
    payloads.collect().foreach(p => amplitudeSink.process(p.events))
    println("DRIVE-AMPLITUDE-REQUESTS=" + transport.requests.length)
    println("DRIVE-AMPLITUDE-SAMPLE=" + transport.requests.head.body.get.take(200))
    spark.stop()
  }
}
