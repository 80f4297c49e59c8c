package graft.amplitude

import graft.SparkTest
import graft.json._
import graft.jsonschema.SchemaValidator
import graft.pings.TestMessages
import graft.sinks.{AmplitudeHttpSink, HttpSink, RecordingTransport}
import graft.streaming.EventsToAmplitude
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ListBuffer

class AmplitudeSpec extends AnyFunSuite with SparkTest {

  private lazy val config = AmplitudeConfig.parse(
    new String(getClass.getResourceAsStream("/amplitudeTestConfig.json").readAllBytes()))

  // ------------------------------------------------------------- validator

  test("schema validator: type/enum/required/minimum/pattern") {
    val schema = Json.parse(
      """{"type": "object",
        | "properties": {
        |   "timestamp": {"type": "number", "minimum": 0},
        |   "category": {"type": "string", "enum": ["action"]},
        |   "value": {"type": "string", "pattern": "^erase"}},
        | "required": ["timestamp", "category"]}""".stripMargin)
    def event(json: String): JsonValue = Json.parse(json)
    assert(SchemaValidator.validates(schema, event("""{"timestamp": 1, "category": "action"}""")))
    assert(!SchemaValidator.validates(schema, event("""{"timestamp": 1}""")))
    assert(!SchemaValidator.validates(schema, event("""{"timestamp": -1, "category": "action"}""")))
    assert(!SchemaValidator.validates(schema, event("""{"timestamp": 1, "category": "other"}""")))
    assert(SchemaValidator.validates(schema, event("""{"timestamp": 1, "category": "action", "value": "erase_home"}""")))
    assert(!SchemaValidator.validates(schema, event("""{"timestamp": 1, "category": "action", "value": "keep"}""")))
  }

  // ---------------------------------------------------------------- config

  test("config parses filters and groups") {
    assert(config.source == "telemetry")
    assert(config.topLevelFilters.keySet == Set("docType", "appName"))
    assert(config.nonTopLevelFilters.keySet == Set("os"))
    assert(config.eventGroups.map(_.eventGroupName) == Seq("m_foc", "second_event_group"))
  }

  test("config validation rejects bad property selectors and missing schema") {
    val bad = """{"source": "telemetry", "filters": {}, "eventGroups": [
                |  {"eventGroupName": "g", "events": [
                |    {"name": "E", "description": "", "schema": {},
                |     "amplitudeProperties": {"x": "no_such_selector"}}]}]}""".stripMargin
    intercept[IllegalArgumentException](AmplitudeConfig.parse(bad))
    val noSchema = """{"source": "telemetry", "filters": {}, "eventGroups": [
                     |  {"eventGroupName": "g", "events": [{"name": "E", "description": ""}]}]}""".stripMargin
    intercept[IllegalArgumentException](AmplitudeConfig.parse(noSchema))
    intercept[IllegalArgumentException](AmplitudeConfig.parse("""{"source": "nope", "eventGroups": []}"""))
  }

  // ---------------------------------------------- focus ping event mapping

  test("focus ping: first-matching schema wins, properties extracted") {
    val payloads = EventsToAmplitude.parsePing(
      TestMessages.focusEventMessages(1).head, sample = 1.0, config)
    assert(payloads.length == 1)
    val payload = payloads.head
    assert(payload.clientId == "client1")
    // 4 events: foreground→AppOpen, type_query→no match,
    // click/erase_home→Erase, background→AppClose
    assert(payload.events.length == 3)
    val parsed = payload.events.map(Json.parse)

    val appOpen = parsed.find(p => (p \ "event_type").asString.contains("m_foc - AppOpen")).get
    assert((appOpen \ "session_id").asLong.contains(1506024685632L))
    assert((appOpen \ "time").asLong.contains(1506024685632L + 176078022L))
    assert((appOpen \ "device_id").asString.contains("client1"))
    assert((appOpen \ "os_name").asString.contains("Android"))
    assert((appOpen \ "os_version").asString.contains("23"))
    assert((appOpen \ "country").asString.contains("CA"))
    assert((appOpen \ "city").asString.contains("Victoria"))
    assert((appOpen \ "app_version").asString.contains("1.1"))
    assert((appOpen \ "user_properties" \ "pref_privacy_block_ads").asBool.contains(true))
    assert((appOpen \ "user_properties" \ "pref_search_engine").asString.contains("custom"))
    assert((appOpen \ "insert_id").asString.get ==
      "client1-1506024685632-AppOpen-176078022-action-foreground-app")

    val erase = parsed.find(p => (p \ "event_type").asString.contains("m_foc - Erase")).get
    assert((erase \ "event_properties" \ "erase_object").asString.contains("erase_home"))
    assert((erase \ "event_properties" \ "literal_field").asString.contains("literal value"))
    assert((erase \ "user_properties" \ "host").asString.contains("side"))

    val appClose = parsed.find(p => (p \ "event_type").asString.contains("second_event_group - AppClose")).get
    assert((appClose \ "event_properties" \ "session_length").asString.contains("1000"))
    // sessionIdOffset pulls extra.sessionLength
    assert((appClose \ "session_id").asLong.contains(1506024685632L + 1000L))
  }

  test("sampling: sampleId must be strictly below sample*100") {
    val env = TestMessages.focusEventMessages(1).head // sampleId = 73
    assert(EventsToAmplitude.parsePing(env, 1.0, config).nonEmpty)   // 73 < 100
    assert(EventsToAmplitude.parsePing(env, 0.73, config).isEmpty)   // 73 < 73 false
    assert(EventsToAmplitude.parsePing(env, 0.74, config).nonEmpty)  // 73 < 74
  }

  test("filters: top-level and non-top-level") {
    val wrongApp = TestMessages.focusEventMessages(1,
      Map("appName" -> Json.str("OtherApp"))).head
    // top-level filter appName mismatches → dropped before dispatch
    assert(EventsToAmplitude.parsePing(wrongApp, 1.0, config).isEmpty)

    // non-top-level "os" filter reads the submission os field
    val iosSubmission = TestMessages.focusEventMessages(1).head
    val patched = iosSubmission.copy(fields = iosSubmission.fields.updated("submission",
      Json.str(iosSubmission.fields("submission").asString.get.replace("\"os\": \"Android\"", "\"os\": \"iOS\""))))
    assert(EventsToAmplitude.parsePing(patched, 1.0, config).isEmpty)
  }

  test("main ping session_split pseudo-event") {
    val ping = graft.pings.MainPing.fromEnvelope(TestMessages.mainMessages(1).head)
    val events = ping.sessionSplitEvents
    assert(events.length == 1)
    val e = events.head
    assert(e.category == "meta" && e.method == "session_split")
    val extra = e.extra.get
    assert(extra("subsession_length") == "3600")
    assert(extra("active_ticks") == "275")
    assert(extra("search_count") == "4")
  }

  test("getEvents over a DataFrame of envelopes") {
    import spark.implicits._
    val df = spark.createDataset(TestMessages.focusEventMessages(5).map(_.toBytes)).toDF("value")
    val ds = EventsToAmplitude.getEvents(config, df, 1.0, raiseOnError = true)
    assert(ds.collect().map(_.events.length).toSeq == Seq.fill(5)(3))
  }

  // ------------------------------------------------------------------ sink

  test("batcher splits by count and estimated bytes") {
    val batcher = AmplitudeHttpSink.Batcher(maxBytesPerBatch = 20, maxEventsPerBatch = 3)
    // each string is 4 chars = 8 estimated bytes; 20 bytes → 2 per batch
    val batches = batcher(Iterator("aaaa", "bbbb", "cccc", "dddd", "eeee")).toList
    assert(batches == List(Seq("aaaa", "bbbb"), Seq("cccc", "dddd"), Seq("eeee")))
    val byCount = AmplitudeHttpSink.Batcher(maxBytesPerBatch = 1000000, maxEventsPerBatch = 2)
    assert(byCount(Iterator("a", "b", "c")).toList == List(Seq("a", "b"), Seq("c")))
  }

  test("httpapi sink form-posts api_key + event list") {
    val transport = new RecordingTransport(Seq(200))
    val sink = AmplitudeHttpSink("KEY", "http://example.test/httpapi",
      HttpSink.Config(transport = transport, sleeper = _ => ()))
    sink.process(Seq("""{"a":1}""", """{"b":2}"""))
    val req = transport.requests.head
    assert(req.form == Seq("api_key" -> "KEY", "event" -> """[{"a":1},{"b":2}]"""))
  }

  test("batch sink JSON-posts with api_key envelope") {
    val transport = new RecordingTransport(Seq(200))
    val sink = AmplitudeHttpSink("KEY", "http://example.test/batch",
      HttpSink.Config(transport = transport, sleeper = _ => ()))
    sink.batchAndProcess(Iterator(Seq("""{"a":1}"""), Seq("""{"b":2}""")))
    assert(transport.requests.length == 1) // batch endpoint flattens pings
    assert(transport.requests.head.body.contains("""{"api_key":"KEY","events":[{"a":1},{"b":2}]}"""))
  }

  test("413 splits the batch in half and resends") {
    val codes = ListBuffer(413, 200, 200)
    val transport = new RecordingTransport(Seq(413, 200, 200))
    val sink = AmplitudeHttpSink("KEY", "http://example.test/batch",
      HttpSink.Config(transport = transport, sleeper = _ => ()))
    sink.process(Seq("\"e1\"", "\"e2\"", "\"e3\"", "\"e4\""))
    assert(transport.requests.length == 3)
    assert(transport.requests(1).body.get.contains("""["e1","e2"]""") ||
      transport.requests(1).body.get.contains("""[\"e1\",\"e2\"]""") ||
      transport.requests(1).body.get.contains(""""e1","e2""""))
    assert(codes.nonEmpty)
  }

  test("unknown endpoint rejected") {
    intercept[IllegalArgumentException](AmplitudeHttpSink("KEY", "http://example.test/other"))
  }
}
