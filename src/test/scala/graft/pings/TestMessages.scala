package graft.pings

import graft.json._

/** Deterministic envelope generators — the fixture backbone, equivalent in
  * shape to the reference's builders (reference:
  * src/test/scala/com/mozilla/telemetry/TestUtils.scala:31-393; field
  * contract in FIXTURES.md).
  */
object TestMessages {

  val TestTimestampNano: Long = 1460036116829920000L // 2016-04-07T02:15:16.8299Z
  val TestTimestampMillis: Long = TestTimestampNano / 1000000L

  case class AppInfo(
      architecture: String, buildId: String, channel: String, name: String,
      version: String, displayVersion: Option[String])

  val Firefox: AppInfo = AppInfo("x86", "20170101000000", "release", "Firefox", "42.0", Some("42.0b1"))
  val Fennec: AppInfo = AppInfo("arm64-v8a", "20170101000000", "release", "Fennec", "59.0", Some("59.0b1"))

  private def applicationJson(app: AppInfo): String =
    JsonObject.of(
      ("architecture", Json.str(app.architecture)),
      ("buildId", Json.str(app.buildId)),
      ("channel", Json.str(app.channel)),
      ("name", Json.str(app.name)),
      ("version", Json.str(app.version)),
      ("displayVersion", app.displayVersion.map(Json.str).getOrElse(JsonNull))
    ).render

  private def baseFields(app: AppInfo, docType: String): Map[String, JsonValue] = Map(
    "clientId" -> Json.str("client1"),
    "docType" -> Json.str(docType),
    "normalizedChannel" -> Json.str(app.channel),
    "appName" -> Json.str(app.name),
    "appVersion" -> Json.num(app.version.toDouble),
    "appBuildId" -> Json.str(app.buildId),
    "geoCountry" -> Json.str("IT"),
    "os" -> Json.str("Linux"),
    "submissionDate" -> Json.str("20170101"),
    "environment.build" -> Json.str(
      s"""{"architecture": "${app.architecture}", "buildId": "${app.buildId}", "version": "${app.version}"}"""),
    "environment.system" -> Json.str("""{"os": {"name": "Linux", "version": "42"}}"""),
    "environment.addons" -> Json.str(
      """{"activeExperiment": {"id": "experiment1", "branch": "control"},
        | "activeAddons": {"my-addon": {"isSystem": true}},
        | "theme": {"id": "firefox-compact-dark@mozilla.org"}}""".stripMargin),
    "environment.profile" -> Json.str("""{"creationDate": 16000}"""),
    "environment.experiments" -> Json.str("""{"experiment2": {"branch": "chaos"}}"""))

  def crashMessages(
      size: Int,
      fieldsOverride: Map[String, JsonValue] = Map.empty,
      customMetadata: String = "",
      processType: Option[String] = None,
      timestamp: Long = TestTimestampNano,
      app: AppInfo = Firefox): Seq[Envelope] = {
    val fields = baseFields(app, "crash") ++ fieldsOverride
    val processTypePart = processType.map(p => s""", "processType": "$p"""").getOrElse("")
    val payload =
      s"""{"payload": {"crashDate": "2017-01-01", "metadata": {$customMetadata}$processTypePart},
         | "application": ${applicationJson(app)}}""".stripMargin
    (1 to size).map(_ => Envelope(fields, timestamp, Some(payload)))
  }

  def mainMessages(
      size: Int,
      fieldsOverride: Map[String, JsonValue] = Map.empty,
      timestamp: Long = TestTimestampNano,
      customPayload: String = ""): Seq[Envelope] = {
    val app = Firefox
    val fields = baseFields(app, "main") ++ Map(
      "sampleId" -> Json.num(73L),
      "environment.system" -> Json.str(
        """{"os": {"name": "Linux", "version": "42"}, "isWow64": false, "memoryMB": 4136}"""),
      "environment.settings" -> Json.str(
        """{"locale": "it_IT", "isDefaultBrowser": true, "attribution": {"source": "example.com"}}"""),
      "payload.histograms" -> Json.str(
        """{"BROWSER_SHIM_USAGE_BLOCKED": {"values": {"0": 1}},
          | "INPUT_EVENT_RESPONSE_COALESCED_MS": {"values": {"1": 1, "150": 2, "250": 3, "2500": 4, "10000": 5}}}""".stripMargin),
      "payload.keyedHistograms" -> Json.str(
        """{"SUBPROCESS_CRASHES_WITH_DUMP": {
          |   "content": {"values": {"0": 1}},
          |   "gpu": {"values": {"0": 1}},
          |   "plugin": {"values": {"0": 1}},
          |   "gmplugin": {"values": {"0": 1}}},
          | "SUBPROCESS_KILL_HARD": {"ShutDownKill": {"values": {"0": 1}}},
          | "SEARCH_COUNTS": {
          |   "ddg.urlbar": {"range": [1, 2], "bucket_count": 3, "histogram_type": 4,
          |                  "values": {"0": 4, "1": 0}, "sum": 4},
          |   "google.suggestion": {"values": {"0": 1}, "sum": 1}}}""".stripMargin),
      "payload.simpleMeasurements" -> Json.str("""{"activeTicks": 275, "firstPaint": 1200}"""),
      "payload.info" -> Json.str(
        """{"subsessionLength": 3600, "subsessionCounter": 1, "sessionId": "sample-session-id",
          | "sessionStartDate": "2018-05-30T11:00:00.0-05:00"}""".stripMargin)
    ) ++ fieldsOverride
    val payload =
      s"""{"application": ${applicationJson(app)}, "payload": {$customPayload}}"""
    (1 to size).map(_ => Envelope(fields, timestamp, Some(payload)))
  }

  /** Event ping with 3 parent + 1 dynamic (normandy enroll) events
    * (shape per FIXTURES.md §5).
    */
  def eventMessages(
      size: Int,
      fieldsOverride: Map[String, JsonValue] = Map.empty,
      timestamp: Long = TestTimestampNano,
      customEvents: Option[String] = None): Seq[Envelope] = {
    val app = Firefox
    val events = customEvents.getOrElse(
      """{"parent": [
        |   [100, "browser", "open", "tab"],
        |   [200, "browser", "close", "tab", "3"],
        |   [300, "search", "execute", "urlbar", null, {"engine": "ddg"}]],
        | "dynamic": [
        |   [4203540, "normandy", "enroll", "preference_study", "awesome-experiment",
        |    {"branch": "control", "experimentType": "exp"}]]}""".stripMargin)
    val fields = baseFields(app, "event") ++ Map(
      "documentId" -> Json.str("doc-id"),
      "sampleId" -> Json.num(73L),
      "environment.settings" -> Json.str("""{"locale": "it_IT"}""")
    ) ++ fieldsOverride
    val payload =
      s"""{"application": ${applicationJson(app)},
         | "payload": {"reason": "periodic", "processStartTimestamp": 1530291900000,
         |   "sessionId": "session-id", "subsessionId": "subsession-id",
         |   "lostEventsCount": 0, "events": $events}}""".stripMargin
    (1 to size).map(_ => Envelope(fields, timestamp, Some(payload)))
  }

  /** Focus event ping: submission in the `submission` field, 4 positional
    * events (shape per FIXTURES.md §3).
    */
  def focusEventMessages(
      size: Int,
      fieldsOverride: Map[String, JsonValue] = Map.empty,
      timestamp: Long = TestTimestampNano): Seq[Envelope] = {
    val submission =
      """{"v": 1, "clientId": "client1", "seq": 162, "locale": "pt-CA",
        | "os": "Android", "osversion": "23", "created": 1506024685632, "tz": -180,
        | "settings": {
        |   "pref_privacy_block_ads": "true", "pref_locale": "",
        |   "pref_privacy_block_social": "true", "pref_secure": "true",
        |   "pref_privacy_block_analytics": "true", "pref_search_engine": "custom",
        |   "pref_privacy_block_other": "false", "pref_default_browser": "true",
        |   "pref_performance_block_webfonts": "false", "pref_performance_block_images": "false",
        |   "pref_autocomplete_installed": "true", "pref_autocomplete_custom": "false"},
        | "events": [
        |   [176078022, "action", "foreground", "app"],
        |   [176127806, "action", "type_query", "search_bar"],
        |   [176151285, "action", "click", "back_button", "erase_home", {"host": "side"}],
        |   [176151591, "action", "background", "app", "", {"sessionLength": "1000"}]]}""".stripMargin
    val fields = Map(
      "clientId" -> Json.str("client1"),
      "documentId" -> Json.str("doc-id"),
      "docType" -> Json.str("focus-event"),
      "normalizedChannel" -> Json.str("release"),
      "appName" -> Json.str("Focus"),
      "appVersion" -> Json.num(1.1),
      "appBuildId" -> Json.str("6"),
      "geoCountry" -> Json.str("CA"),
      "geoCity" -> Json.str("Victoria"),
      "sampleId" -> Json.num(73L),
      "submissionDate" -> Json.str("20170101"),
      "submission" -> Json.str(submission)
    ) ++ fieldsOverride
    (1 to size).map(_ => Envelope(fields, timestamp, None))
  }

  /** Mobile event ping (docType `mobile-event`): same submission shape as
    * focus-event but dispatched to MobileEventPing (appName=Fennec) or
    * FireTvEventPing (appName=FirefoxForFireTV). Settings carry keys for
    * BOTH variants so one fixture exercises each app's user-property
    * projection.
    */
  def mobileEventMessages(
      size: Int,
      appName: String = "Fennec",
      fieldsOverride: Map[String, JsonValue] = Map.empty,
      timestamp: Long = TestTimestampNano): Seq[Envelope] = {
    val submission =
      """{"v": 1, "clientId": "client1", "seq": 7, "locale": "en-US",
        | "os": "Android", "osversion": "25", "created": 1506024685632, "tz": -180,
        | "arch": "arm64-v8a", "device": "pixel",
        | "settings": {
        |   "defaultSearchEngine": "wiki",
        |   "prefKeyThemeName": "dark",
        |   "profile.blockPopups": "true",
        |   "tracking_protection_enabled": "true",
        |   "total_home_tile_count": "12",
        |   "app_id": "tv-app"},
        | "events": [
        |   [5000, "action", "click", "menu"],
        |   [6000, "action", "play", "video", "", {"duration": "33"}]]}""".stripMargin
    val fields = Map(
      "clientId" -> Json.str("client1"),
      "documentId" -> Json.str("doc-id"),
      "docType" -> Json.str("mobile-event"),
      "normalizedChannel" -> Json.str("release"),
      "appName" -> Json.str(appName),
      "appVersion" -> Json.num(2.0),
      "appBuildId" -> Json.str("9"),
      "geoCountry" -> Json.str("DE"),
      "geoCity" -> Json.str("Berlin"),
      "sampleId" -> Json.num(73L),
      "submissionDate" -> Json.str("20170101"),
      "submission" -> Json.str(submission)
    ) ++ fieldsOverride
    (1 to size).map(_ => Envelope(fields, timestamp, None))
  }

  /** Frecency-update ping (shape per FIXTURES.md §6). */
  def frecencyMessages(
      size: Int,
      modelVersion: Long = 140L,
      loss: Double = 291989.21,
      update: Seq[Double] = (1 to 22).map(_.toDouble * 0.5),
      studyVariation: String = "model1",
      suggestionsDisplayed: Long = 2L,
      timestamp: Long = TestTimestampNano): Seq[Envelope] = {
    val fields = baseFields(Firefox, "frecency-update")
    val payload =
      s"""{"model_version": $modelVersion, "frecency_scores": [1.0, 2.0, 3.0, 4.0],
         | "loss": $loss, "update": [${update.mkString(",")}],
         | "num_suggestions_displayed": 5, "rank_selected": 1,
         | "bookmark_and_history_num_suggestions_displayed": $suggestionsDisplayed,
         | "study_variation": "$studyVariation", "study_addon_version": "1.0.0"}""".stripMargin
    (1 to size).map(_ => Envelope(fields, timestamp, Some(payload)))
  }

  def coreMessages(
      size: Int,
      fieldsOverride: Map[String, JsonValue] = Map.empty,
      timestamp: Long = TestTimestampNano): Seq[Envelope] = {
    val app = Fennec
    val submission =
      """{"durations": 3600, "device": "pixel", "displayVersion": "59.0b1", "tz": 120,
        | "locale": "it_IT", "arch": "arm64-v8a", "os": "Android", "seq": 1, "v": 9,
        | "clientId": "client1", "osversion": "27", "sessions": 1, "profileDate": 16000,
        | "defaultBrowser": true, "created": "2017-01-01"}""".stripMargin
    val fields = baseFields(app, "core") ++ Map(
      "submission" -> Json.str(submission),
      "sourceName" -> Json.str("telemetry"),
      "documentId" -> Json.str("doc-id")
    ) ++ fieldsOverride
    (1 to size).map(_ => Envelope(fields, timestamp, None))
  }
}
