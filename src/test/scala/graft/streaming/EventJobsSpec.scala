package graft.streaming

import graft.SparkTest
import graft.pings.TestMessages
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class EventJobsSpec extends AnyFunSuite with SparkTest {

  private def toDF(messages: Seq[graft.pings.Envelope]): DataFrame = {
    import spark.implicits._
    spark.createDataset(messages.map(_.toBytes)).toDF("value")
  }

  test("event explode: one row per event per process with golden fields") {
    val df = EventPingEvents.explodeEvents(toDF(TestMessages.eventMessages(1)))
    val rows = df.collect()
    assert(rows.length == 4)
    assert(df.columns.length == 22)

    val normandy = rows.find(_.event_category == "normandy").get
    assert(normandy.document_id == "doc-id")
    assert(normandy.client_id == "client1")
    assert(normandy.normalized_channel == "release")
    assert(normandy.country == "IT")
    assert(normandy.locale.contains("it_IT"))
    assert(normandy.app_name == "Firefox")
    assert(normandy.os.contains("Linux"))
    assert(normandy.os_version.contains("42"))
    assert(normandy.session_id == "session-id")
    assert(normandy.subsession_id == "subsession-id")
    assert(normandy.session_start_time == 1530291900000L)
    assert(normandy.sample_id.contains("73"))
    assert(normandy.experiments.contains(Map("experiment1" -> "control", "experiment2" -> "chaos")))
    assert(normandy.event_timestamp == 4203540L)
    assert(normandy.event_method == "enroll")
    assert(normandy.event_object == "preference_study")
    assert(normandy.event_string_value.contains("awesome-experiment"))
    assert(normandy.event_map_values.contains(Map("branch" -> "control", "experimentType" -> "exp")))
    assert(normandy.event_process == "dynamic")

    val searchEvent = rows.find(_.event_category == "search").get
    assert(searchEvent.event_string_value.isEmpty)
    assert(searchEvent.event_map_values.contains(Map("engine" -> "ddg")))
    assert(searchEvent.event_process == "parent")
  }

  test("event explode drops non-event doctypes") {
    assert(EventPingEvents.explodeEvents(toDF(TestMessages.mainMessages(3))).count() == 0)
  }

  test("enrollments aggregate counts enroll/unenroll per window") {
    val enrolls = TestMessages.eventMessages(3)
    val unenrolls = TestMessages.eventMessages(2, customEvents = Some(
      """{"dynamic": [[5000, "normandy", "unenroll", "preference_study",
        |  "awesome-experiment", {"branch": "control"}]]}""".stripMargin))
    val df = ExperimentEnrollmentsAggregator.aggregate(toDF(enrolls ++ unenrolls))
    val rows = df.collect()
    assert(rows.length == 1)
    val row = rows.head
    assert(row.getAs[String]("object") == "preference_study")
    assert(row.getAs[String]("experiment_id") == "awesome-experiment")
    assert(row.getAs[String]("branch_id") == "control")
    assert(row.getAs[Long]("enroll_count") == 3L)
    assert(row.getAs[Long]("unenroll_count") == 2L)
    assert(row.getAs[String]("submission_date_s3") == "20160407")
    assert(row.getAs[Timestamp]("window_start").getTime <= TestMessages.TestTimestampMillis)
  }

  test("enrollments: normandy events also extracted from main pings") {
    val mains = TestMessages.mainMessages(2, customPayload =
      """"processes": {"dynamic": {"events": [[100, "normandy", "enroll",
        |  "preference_study", "exp-a", {"branch": "b1"}]]}}""".stripMargin)
    val df = ExperimentEnrollmentsAggregator.aggregate(toDF(mains))
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("experiment_id") == "exp-a")
    assert(rows.head.getAs[Long]("enroll_count") == 2L)
  }

  test("uptake events to DogStatsD metrics") {
    val uptake = TestMessages.eventMessages(1, customEvents = Some(
      """{"parent": [
        |  [100, "uptake.remotecontent.result", "uptake", "remotesettings", "success",
        |   {"source": "settings-changes/monitoring/x", "duration": "12", "age": "300"}],
        |  [200, "normandy", "enroll", "preference_study", "my-exp", {"branch": "control"}]]}""".stripMargin))
    val metrics = UptakeEventsToDatadog.eventsToMetrics(toDF(uptake), raiseOnError = true).collect()
    assert(metrics.length == 4) // counter + duration + age + normandy counter

    val counter = metrics.find(_.metricName == "telemetry.uptake.remotesettings.uptake.success").get
    assert(counter.metricType == "c")
    assert(counter.kvTags.contains(Map(
      "source_type" -> "settings-changes", "source_subtype" -> "monitoring", "source_details" -> "x")))
    val timer = metrics.find(_.metricName == "telemetry.uptake.remotesettings.uptake.success.duration").get
    assert(timer.metricType == "ms" && timer.metricValue == "12")
    assert(metrics.exists(_.metricName == "telemetry.uptake.remotesettings.uptake.success.age"))
    val normandyCounter = metrics.find(_.metricName == "telemetry.normandy.preference_study.enroll").get
    assert(normandyCounter.kvTags.contains(Map("experiment" -> "my-exp", "branch" -> "control")))
  }

  test("crash pings format as Influx lines and OpenTSDB JSON") {
    val crashes = toDF(TestMessages.crashMessages(1))
    val influx = CrashesToInflux.getParsedPings(crashes, raiseOnError = true, "firefox_crashes").collect()
    assert(influx.length == 1)
    val line = influx.head
    assert(line.startsWith("firefox_crashes,submissionDate=20170101,appVersion=42.0,appName=Firefox"))
    assert(line.contains("buildId=20170101000000 " + TestMessages.TestTimestampNano))

    val tsdb = CrashesToOpenTsdb.getParsedPings(crashes, raiseOnError = true, "firefox_crashes").collect()
    val parsed = graft.json.Json.parse(tsdb.head)
    assert((parsed \ "metric").asString.contains("firefox_crashes"))
    assert((parsed \ "timestamp").asLong.contains(TestMessages.TestTimestampMillis))
    assert((parsed \ "value").asString.contains("20170101000000"))
    assert((parsed \ "tags" \ "channel").asString.contains("release"))
  }

  test("crash signature external command: success, failure, timeout") {
    assert(CrashSignature.fromExternalCommand(Seq("cat"), "mozilla::sig", 5)
      .contains("mozilla::sig"))
    assert(CrashSignature.fromExternalCommand(Seq("false"), "x", 1, maxRetries = 2).isEmpty)
    assert(CrashSignature.fromExternalCommand(Seq("/nonexistent-cmd"), "x", 1).isEmpty)
    val t0 = System.nanoTime()
    assert(CrashSignature.fromExternalCommand(Seq("sleep", "30"), "x",
      baseTimeoutSeconds = 1, maxRetries = 1).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 10)
  }

  test("crash signature provider feeds the output tags") {
    val crashes = toDF(TestMessages.crashMessages(1))
    val influx = CrashesToInflux.getParsedPings(crashes, raiseOnError = true, "fc",
      signatureProvider = Some(_ => Some("sig with space"))).collect()
    assert(influx.head.contains("""crashSignature=sig\ with\ space"""))
  }

  test("crash signature formatting per backend") {
    assert(CrashesToInflux.formatCrashSignature("a b,c=d\"e") == """a\ b\,c\=d\"e""")
    assert(CrashesToOpenTsdb.formatCrashSignature("mozilla::dom | fun (x)") == "mozilla-dom.fun_/x/")
  }
}
