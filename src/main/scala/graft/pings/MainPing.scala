package graft.pings

import graft.json._

/** Main ("saved-session") ping with the scalar/histogram extractors the
  * aggregation jobs use (reference: src/main/scala/com/mozilla/telemetry/pings/MainPing.scala).
  */
final case class MainPing(
    application: Option[Application],
    meta: Meta,
    processes: JsonValue)
  extends TelemetryPing with HasEnvironment with HasApplication
  with graft.amplitude.SendsToAmplitudeWithEnvironment {

  def getClientId: Option[String] = meta.clientId
  def getCreated: Option[Long] = meta.creationTimestamp.map(t => (t / 1e9).toLong)

  /** Ping-level pseudo-event carrying session stats
    * (reference: MainPing.scala:136-149).
    */
  override def sessionSplitEvents: Seq[TelemetryEvent] = {
    val extra = Map(
      "subsession_length" -> Some(subsessionLength),
      "active_ticks" -> activeTicks,
      "uri_count" -> getScalarValue("parent", "browser.engagement.total_uri_count"),
      "search_count" -> Some(searchCount),
      "reason" -> reason)
      .collect { case (k, Some(v)) => k -> v.toString }
    Seq(TelemetryEvent(sessionLength, "meta", "session_split", "", None, Some(extra)))
  }

  /** Count histogram = bucket "0" of `values` (reference: MainPing.scala:21-30). */
  def getCountHistogramValue(name: String): Option[Int] =
    (meta.payloadHistograms \ name \ "values" \ "0").asInt

  /** Keyed count histogram (reference: MainPing.scala:32-41). */
  def getCountKeyedHistogramValue(name: String, key: String): Option[Int] =
    (meta.payloadKeyedHistograms \ name \ key \ "values" \ "0").asInt

  /** Sum of histogram values whose integer bucket ≥ threshold
    * (reference: MainPing.scala:44-62). Non-integer maps count 0.
    */
  def histogramThresholdCount(name: String, threshold: Int, processType: String): Long = {
    val hist = processType match {
      case "main" => meta.payloadHistograms
      case p      => processes \ p \ "histograms"
    }
    (hist \ name \ "values").asIntMap match {
      case Some(m) =>
        m.collect {
          case (k, v) if k.toIntOption.exists(_ >= threshold) => v.toLong
        }.sum
      case None => 0L
    }
  }

  def getScalarValue(processType: String, scalarName: String): Option[Long] =
    (processes \ processType \ "scalars" \ scalarName).asLong

  /** subsessionLength seconds → hours clamped to [0, 25]
    * (reference: MainPing.scala:71-82).
    */
  def usageHours: Option[Float] =
    (meta.payloadInfo \ "subsessionLength").asLong
      .map(len => math.min(25f, math.max(0f, len.toFloat / TelemetryPing.SecondsPerHour)))

  /** SEARCH_COUNTS sum over direct sources; keys are `<engine>.<source>`
    * (reference: MainPing.scala:84-101).
    */
  def searchCount: Long = (meta.payloadKeyedHistograms \ "SEARCH_COUNTS").asObject match {
    case Some(hists) =>
      hists.collect {
        case (name, hist) if MainPing.isDirectSearch(name) =>
          (hist \ "sum").asLong.getOrElse(0L)
      }.sum
    case None => 0L
  }

  /** firstPaint only counts when reported by the first subsession
    * (reference: MainPing.scala:107-122).
    */
  def firstPaint: Option[Int] = isFirstSubsession match {
    case Some(true) => (meta.payloadSimpleMeasurements \ "firstPaint").asInt
    case _          => None
  }

  def isFirstSubsession: Option[Boolean] =
    (meta.payloadInfo \ "subsessionCounter").asInt.map(_ == 1)

  def sessionId: Option[String] = (meta.payloadInfo \ "sessionId").asString

  /** Session start: parsed sessionStartDate, else envelope time minus the
    * latest event offset (reference: MainPing.scala:158-162).
    */
  def sessionStart: Long = (meta.payloadInfo \ "sessionStartDate").asString match {
    case Some(d) => java.time.OffsetDateTime.parse(d).toEpochSecond * 1000
    // maxOption: a ping with no events must not throw (the reference's
    // bare .max is a latent crash that silently drops such pings)
    case None => (meta.timestamp / 1e9).toLong - events.map(_.timestamp).maxOption.getOrElse(0L)
  }

  def sessionLength: Long = (meta.payloadInfo \ "sessionLength").asLong.getOrElse(0L)
  def subsessionLength: Long = (meta.payloadInfo \ "subsessionLength").asLong.getOrElse(0L)

  /** Scalar preferred over simpleMeasurements (reference bug 1482924,
    * MainPing.scala:174-183).
    */
  def activeTicks: Option[Long] =
    getScalarValue("parent", "browser.engagement.active_ticks")
      .orElse((meta.payloadSimpleMeasurements \ "activeTicks").asLong)

  def reason: Option[String] = (meta.payloadInfo \ "reason").asString

  /** Events from the dynamic process with category == "normandy"
    * (reference: MainPing.scala:131-134).
    */
  def getNormandyEvents: Seq[TelemetryEvent] =
    TelemetryPing.extractEvents(processes, List(List("dynamic", "events")))
      .filter(_.category == "normandy")

  lazy val events: Seq[TelemetryEvent] =
    TelemetryPing.extractEvents(processes, MainPing.eventLocations())
}

object MainPing {
  val DirectSearchSources: Set[String] =
    Set("urlbar", "searchbar", "newtab", "abouthome", "contextmenu", "system")

  /** Key shape is `<engine>.<source>[...]`; only the source segment decides. */
  def isDirectSearch(keyName: String): Boolean = keyName.split('.').toList match {
    case _ :: source :: _ => DirectSearchSources.contains(source)
    case _                => false
  }

  /** Per-process event containers (reference: pings/main/Processes). */
  val ProcessNames: Seq[String] = Seq("parent", "content", "dynamic")

  def eventLocations(prefix: List[String] = Nil): List[List[String]] =
    ProcessNames.map(p => prefix ++ List(p, "events")).toList

  def fromEnvelope(env: Envelope): MainPing = {
    val payload = env.payloadJson
    MainPing(
      application = Application.fromJson(payload \ "application"),
      meta = Meta.fromEnvelope(env),
      processes = payload \ "payload" \ "processes")
  }
}
