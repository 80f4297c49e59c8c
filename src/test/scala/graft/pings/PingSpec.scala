package graft.pings

import graft.json.Json
import org.scalatest.funsuite.AnyFunSuite

/** Extractor/normalization unit tests mirroring the reference's coverage
  * (reference: src/test/scala/com/mozilla/telemetry/pings/PingsTest.scala:53-128).
  */
class PingSpec extends AnyFunSuite {

  private def mainPing(fieldsOverride: Map[String, graft.json.JsonValue] = Map.empty,
                       customPayload: String = ""): MainPing =
    MainPing.fromEnvelope(
      TestMessages.mainMessages(1, fieldsOverride, customPayload = customPayload).head)

  test("envelope round-trips through bytes") {
    val env = TestMessages.crashMessages(1).head
    val back = Envelope.parseFrom(env.toBytes)
    assert(back.timestamp == env.timestamp)
    assert(back.fieldString("docType").contains("crash"))
    assert(back.payload == env.payload)
  }

  test("count histogram value = bucket 0") {
    val ping = mainPing()
    assert(ping.getCountHistogramValue("BROWSER_SHIM_USAGE_BLOCKED").contains(1))
    assert(ping.getCountHistogramValue("NONEXISTENT").isEmpty)
  }

  test("keyed count histogram") {
    val ping = mainPing()
    assert(ping.getCountKeyedHistogramValue("SUBPROCESS_CRASHES_WITH_DUMP", "gpu").contains(1))
    assert(ping.getCountKeyedHistogramValue("SUBPROCESS_CRASHES_WITH_DUMP", "nope").isEmpty)
  }

  test("histogram threshold count sums buckets >= threshold") {
    val ping = mainPing()
    // INPUT_EVENT_RESPONSE_COALESCED_MS: {1:1, 150:2, 250:3, 2500:4, 10000:5}
    assert(ping.histogramThresholdCount("INPUT_EVENT_RESPONSE_COALESCED_MS", 150, "main") == 14L)
    assert(ping.histogramThresholdCount("INPUT_EVENT_RESPONSE_COALESCED_MS", 250, "main") == 12L)
    assert(ping.histogramThresholdCount("INPUT_EVENT_RESPONSE_COALESCED_MS", 2501, "main") == 5L)
    assert(ping.histogramThresholdCount("UNKNOWN", 1, "main") == 0L)
  }

  test("usage hours clamps to [0, 25]") {
    assert(mainPing().usageHours.contains(1.0f))
    val longSession = mainPing(Map(
      "payload.info" -> Json.str("""{"subsessionLength": 1000000}""")))
    assert(longSession.usageHours.contains(25.0f))
    val negative = mainPing(Map(
      "payload.info" -> Json.str("""{"subsessionLength": -1}""")))
    assert(negative.usageHours.contains(0.0f))
    val absent = mainPing(Map("payload.info" -> Json.str("{}")))
    assert(absent.usageHours.isEmpty)
  }

  test("search count sums only direct sources") {
    // ddg.urlbar sum=4 counts; google.suggestion sum=1 does not
    assert(mainPing().searchCount == 4L)
  }

  test("firstPaint gated on first subsession") {
    assert(mainPing().firstPaint.contains(1200))
    val second = mainPing(Map(
      "payload.info" -> Json.str("""{"subsessionCounter": 2}""")))
    assert(second.firstPaint.isEmpty)
  }

  test("activeTicks prefers parent scalar over simpleMeasurements") {
    assert(mainPing().activeTicks.contains(275L))
    val withScalar = mainPing(customPayload =
      """"processes": {"parent": {"scalars": {"browser.engagement.active_ticks": 123}}}""")
    assert(withScalar.activeTicks.contains(123L))
  }

  test("OS version normalization") {
    assert(OsInfo(Some("Linux"), Some("10.2.42-hello")).normalizedVersion.contains("10.2.42"))
    assert(OsInfo(Some("Linux"), Some("42")).normalizedVersion.contains("42"))
    assert(OsInfo(Some("Linux"), Some("10.2.42.3")).normalizedVersion.contains("10.2.42"))
    assert(OsInfo(Some("Linux"), Some("nonsense")).normalizedVersion.isEmpty)
  }

  test("buildId accepted only 0-6 months before submission") {
    val ping = mainPing()
    assert(ping.getNormalizedBuildId.contains("20170101000000"))
    val tooOld = mainPing(Map("environment.build" -> Json.str(
      """{"architecture": "x86", "buildId": "20160101000000", "version": "42.0"}""")))
    assert(tooOld.getNormalizedBuildId.isEmpty)
    val future = mainPing(Map("environment.build" -> Json.str(
      """{"architecture": "x86", "buildId": "20180101000000", "version": "42.0"}""")))
    assert(future.getNormalizedBuildId.isEmpty)
  }

  test("experiments fan out to old-style + new-style + null") {
    val exps = mainPing().getExperiments.toSet
    assert(exps == Set(
      (Some("experiment1"), Some("control")),
      (Some("experiment2"), Some("chaos")),
      (None, None)))
  }

  test("sampleId double renders as int string") {
    assert(mainPing().meta.stringSampleId.contains("73"))
  }

  test("epoch day to ISO-8601") {
    assert(Meta.epochDayToIso8601(0) == "1970-01-01")
    assert(Meta.epochDayToIso8601(16000) == "2013-10-22")
  }

  test("ns timestamp normalizes to ms") {
    assert(mainPing().meta.normalizedTimestamp.getTime == TestMessages.TestTimestampMillis)
  }

  test("crash classification") {
    val main = CrashPing.fromEnvelope(TestMessages.crashMessages(1).head)
    assert(main.isMainCrash && !main.isContentCrash && !main.isStartupCrash)
    val startup = CrashPing.fromEnvelope(
      TestMessages.crashMessages(1, customMetadata = """"StartupCrash": "1"""").head)
    assert(startup.isStartupCrash)
    val content = CrashPing.fromEnvelope(
      TestMessages.crashMessages(1, processType = Some("content")).head)
    assert(content.isContentCrash && !content.isMainCrash && !content.isContentShutdownCrash)
    val shutdown = CrashPing.fromEnvelope(
      TestMessages.crashMessages(1, customMetadata = """"ipc_channel_error": "ShutDownKill"""",
        processType = Some("content")).head)
    assert(shutdown.isContentShutdownCrash)
  }

  test("Fennec crash on Linux reports Android") {
    val fennec = CrashPing.fromEnvelope(TestMessages.crashMessages(1, app = TestMessages.Fennec).head)
    assert(fennec.getOsName.contains("Android"))
    val firefox = CrashPing.fromEnvelope(TestMessages.crashMessages(1).head)
    assert(firefox.getOsName.contains("Linux"))
  }

  test("core ping usage hours and display version fallback") {
    val core = CorePing.fromEnvelope(TestMessages.coreMessages(1).head)
    assert(core.usageHours.contains(1.0f))
    assert(core.getDisplayVersion.contains("59.0b1"))
    assert(core.getOsName.contains("Android"))
    assert(core.getExperiments.toSeq == Seq((None, None)))
  }

  test("amplitude dispatch: docType + appName select the ping class") {
    import graft.amplitude.SendsToAmplitude
    val focus = SendsToAmplitude.fromEnvelope(TestMessages.focusEventMessages(1).head)
    assert(focus.isInstanceOf[FocusEventPing])

    def mobileVariant(docType: String, appName: String) = {
      val base = TestMessages.focusEventMessages(1).head
      base.copy(fields = base.fields
        .updated("docType", Json.str(docType))
        .updated("appName", Json.str(appName)))
    }
    assert(SendsToAmplitude.fromEnvelope(mobileVariant("focus-event", "Zerda"))
      .isInstanceOf[RocketEventPing])
    assert(SendsToAmplitude.fromEnvelope(mobileVariant("mobile-event", "Fennec"))
      .isInstanceOf[MobileEventPing])
    assert(SendsToAmplitude.fromEnvelope(mobileVariant("mobile-event", "FirefoxForFireTV"))
      .isInstanceOf[FireTvEventPing])
    assert(SendsToAmplitude.fromEnvelope(TestMessages.mainMessages(1).head)
      .isInstanceOf[MainPing])
    assert(SendsToAmplitude.fromEnvelope(TestMessages.eventMessages(1).head)
      .isInstanceOf[EventPing])
    intercept[IllegalArgumentException](
      SendsToAmplitude.fromEnvelope(mobileVariant("focus-event", "Chrome")))
    intercept[IllegalArgumentException](
      SendsToAmplitude.fromEnvelope(TestMessages.crashMessages(1).head))
  }

  test("mobile ping user properties carry per-app settings") {
    val focus = FocusEventPing.fromEnvelope(TestMessages.focusEventMessages(1).head)
    val props = focus.pingAmplitudeProperties
    assert((props \ "device_id").asString.contains("client1"))
    assert((props \ "user_properties" \ "pref_privacy_block_ads").asBool.contains(true))
    assert((props \ "user_properties" \ "pref_search_engine").asString.contains("custom"))
    assert(focus.getSessionId.contains("176151591"))
  }

  test("positional event arrays reshape to typed events") {
    val events = TelemetryPing.extractEvents(
      Json.parse(
        """{"parent": {"events": [[4203540, "normandy", "enroll", "preference_study",
          |  "awesome-experiment", {"branch": "control"}], [100, "cat", "m", "o"]]}}""".stripMargin),
      List(List("parent", "events")))
    assert(events.size == 2)
    assert(events.head == TelemetryEvent(4203540L, "normandy", "enroll", "preference_study",
      Some("awesome-experiment"), Some(Map("branch" -> "control"))))
    assert(events(1).value.isEmpty && events(1).extra.isEmpty)
    assert(events.head.getField("extra.branch") == "control")
    assert(events.head.getField("literal.x") == "x")
    assert(events.head.getField("object") == "preference_study")
  }
}
