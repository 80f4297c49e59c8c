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

  // ------------------------------------- config breadth (configs/*.json)
  // Original configs exercising every meta-schema feature the reference's
  // seven production configs use (reference:
  // src/test/scala/com/mozilla/telemetry/streaming/EventsToAmplitudeTest.scala:397-405):
  // cohorts source + experiment filters, pseudo-event matching,
  // extra./literal./value/method/object selectors, sessionIdOffset,
  // per-app user properties, multi-schema first-match.

  private def loadConfig(name: String): AmplitudeConfig =
    AmplitudeConfig.load(s"configs/$name.json")

  test("all shipped configs validate against the meta-schema") {
    val files = new java.io.File("configs").listFiles((_, n) => n.endsWith(".json"))
    assert(files != null && files.length >= 4)
    files.foreach { f =>
      val cfg = AmplitudeConfig.load(f.getPath) // throws on meta-schema violation
      assert(cfg.eventGroups.flatMap(_.events).nonEmpty, f.getName)
    }
  }

  test("cohorts config: main-ping session_split pseudo-event with extra/literal/method/object selectors") {
    val cfg = loadConfig("experiment_session_metrics")
    assert(cfg.source == "telemetry-cohorts")
    // experimentId/experimentBranch are partition-only: absent from the
    // envelope, so they apply at scan time and are skipped at parse time
    assert(cfg.topLevelFilters.keySet ==
      Set("docType", "experimentId", "experimentBranch"))
    val payloads = EventsToAmplitude.parsePing(
      graft.pings.TestMessages.mainMessages(1).head, 1.0, cfg)
    assert(payloads.length == 1)
    val e = Json.parse(payloads.head.events.head)
    assert((e \ "event_type").asString.contains("session_metrics - SessionSplit"))
    val props = e \ "event_properties"
    assert((props \ "subsession_length").asString.contains("3600"))
    assert((props \ "active_ticks").asString.contains("275"))
    assert((props \ "search_count").asString.contains("4"))
    assert((props \ "pipeline_tag").asString.contains("cohorts-v1"))
    assert((props \ "event_kind").asString.contains("session_split"))
    assert((props \ "event_surface").asString.contains(""))
    // main ping rides environment experiments into user_properties
    assert((e \ "user_properties" \ "experiments").isDefined)
  }

  test("desktop event config: first-matching schema wins over the catch-all group") {
    val cfg = loadConfig("desktop_event_funnel")
    val payloads = EventsToAmplitude.parsePing(
      graft.pings.TestMessages.eventMessages(1).head, 1.0, cfg)
    assert(payloads.length == 1)
    val types = payloads.head.events.map(s => (Json.parse(s) \ "event_type").asString.get)
    // open/close/search match their specific groups even though the
    // trailing catch-all also validates them; normandy enroll only
    // matches the catch-all
    assert(types == Seq(
      "navigation - TabOpened",
      "navigation - TabClosed",
      "search - SearchExecuted",
      "catch_all - AnyEvent"))
    val parsed = payloads.head.events.map(Json.parse)
    val closed = parsed.find(p => (p \ "event_type").asString.contains("navigation - TabClosed")).get
    assert((closed \ "event_properties" \ "tabs_remaining").asString.contains("3"))
    val search = parsed.find(p => (p \ "event_type").asString.contains("search - SearchExecuted")).get
    assert((search \ "event_properties" \ "surface").asString.contains("urlbar"))
    assert((search \ "user_properties" \ "search_engine").asString.contains("ddg"))
  }

  test("mobile config: one config, per-app user-property variants") {
    val cfg = loadConfig("mobile_multi_app")
    val fennec = EventsToAmplitude.parsePing(
      graft.pings.TestMessages.mobileEventMessages(1, appName = "Fennec").head, 1.0, cfg)
    val firetv = EventsToAmplitude.parsePing(
      graft.pings.TestMessages.mobileEventMessages(1, appName = "FirefoxForFireTV").head, 1.0, cfg)
    assert(fennec.length == 1 && firetv.length == 1)
    assert(fennec.head.events.length == 2 && firetv.head.events.length == 2)

    val fEvent = Json.parse(fennec.head.events.head)
    val tvEvent = Json.parse(firetv.head.events.head)
    // MobileEventPing projects device/arch + profile settings...
    assert((fEvent \ "device_model").asString.contains("pixel"))
    assert((fEvent \ "user_properties" \ "pref_default_search_engine").asString.contains("wiki"))
    assert((fEvent \ "user_properties" \ "pref_block_popups").asBool.contains(true))
    assert((fEvent \ "user_properties" \ "app_id").asString.isEmpty)
    // ...FireTvEventPing projects the TV-specific settings instead
    assert((tvEvent \ "user_properties" \ "app_id").asString.contains("tv-app"))
    assert((tvEvent \ "user_properties" \ "total_home_tile_count").asString.contains("12"))
    assert((tvEvent \ "user_properties" \ "pref_default_search_engine").asString.isEmpty)

    val fPlay = Json.parse(fennec.head.events(1))
    assert((fPlay \ "event_properties" \ "duration_seconds").asString.contains("33"))
    assert((fPlay \ "event_properties" \ "media_kind").asString.contains("video"))
  }

  test("focus/rocket config: sessionIdOffset + pattern schema + app dispatch by appName") {
    val cfg = loadConfig("focus_rocket_browsing")
    val focusEnv = graft.pings.TestMessages.focusEventMessages(1).head
    val zerdaEnv = focusEnv.copy(fields = focusEnv.fields.updated("appName", Json.str("Zerda")))

    val focus = EventsToAmplitude.parsePing(focusEnv, 1.0, cfg)
    val zerda = EventsToAmplitude.parsePing(zerdaEnv, 1.0, cfg)
    assert(focus.length == 1 && zerda.length == 1)
    // background + erase_home events match; foreground/type_query don't
    assert(focus.head.events.length == 2)

    val parsed = focus.head.events.map(Json.parse)
    val end = parsed.find(p => (p \ "event_type").asString.contains("m_browse - SessionEnd")).get
    assert((end \ "session_id").asLong.contains(1506024685632L + 1000L))
    assert((end \ "event_properties" \ "session_length").asString.contains("1000"))
    val erase = parsed.find(p => (p \ "event_type").asString.contains("m_browse - EraseAction")).get
    assert((erase \ "event_properties" \ "erase_kind").asString.contains("erase_home"))
    assert((erase \ "event_properties" \ "flow_tag").asString.contains("browse-v2"))
    assert((erase \ "user_properties" \ "origin_host").asString.contains("side"))

    // same config, different appName → RocketEventPing's user properties
    val zEvent = Json.parse(zerda.head.events.head)
    assert((zEvent \ "user_properties" \ "pref_search_engine").asString.contains("custom"))
    assert((zEvent \ "user_properties").asObject.exists(!_.contains("pref_privacy_block_ads")))
    val fEvent = Json.parse(focus.head.events.head)
    assert((fEvent \ "user_properties" \ "pref_privacy_block_ads").asBool.contains(true))
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
