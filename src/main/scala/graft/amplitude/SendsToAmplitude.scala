package graft.amplitude

import graft.json._
import graft.jsonschema.SchemaValidator
import graft.pings._

import scala.collection.immutable.ListMap
import scala.util.{Success, Try}

final case class KeyedAmplitudePayload(clientId: String, events: Seq[String])

/** JSON helpers for amplitude payload assembly: optional fields are
  * omitted (json4s `~`-with-Option semantics in the reference).
  */
object AmplitudeJson {
  def jobj(fields: (String, Option[JsonValue])*): JsonObject =
    JsonObject(ListMap(fields.collect { case (k, Some(v)) => k -> v }: _*))

  def s(v: String): Option[JsonValue] = Some(JsonString(v))
  def so(v: Option[String]): Option[JsonValue] = v.map(JsonString(_))
  def n(v: Long): Option[JsonValue] = Some(Json.num(v))
  def no(v: Option[Double]): Option[JsonValue] = v.map(Json.num)
  def bo(v: Option[Boolean]): Option[JsonValue] = v.map(JsonBool(_))
  /** "true"/other string pref → boolean (reference FocusSettings.asBool). */
  def boolPref(v: Option[String]): Option[JsonValue] = bo(v.map(_ == "true"))

  /** Deep merge; right side wins on scalar conflicts
    * (json4s `merge` semantics).
    */
  def merge(a: JsonValue, b: JsonValue): JsonValue = (a, b) match {
    case (JsonObject(fa), JsonObject(fb)) =>
      val keys = (fa.keys ++ fb.keys).toSeq.distinct
      JsonObject(ListMap(keys.map { k =>
        k -> ((fa.get(k), fb.get(k)) match {
          case (Some(va), Some(vb)) => merge(va, vb)
          case (Some(va), None)     => va
          case (None, Some(vb))     => vb
          case _                    => JsonNull
        })
      }: _*))
    case (_, other) => other
  }

  /** Event → JSON instance for schema matching (the decomposed shape the
    * reference validates — absent for None fields).
    */
  def eventInstance(e: TelemetryEvent): JsonObject = jobj(
    ("timestamp", n(e.timestamp)),
    ("category", s(e.category)),
    ("method", s(e.method)),
    ("object", s(e.obj)),
    ("value", so(e.value)),
    ("extra", e.extra.map(m =>
      JsonObject(ListMap(m.toSeq.map { case (k, v) => k -> (JsonString(v): JsonValue) }: _*)))))

  def properties(e: TelemetryEvent, selectors: Option[Map[String, String]]): JsonObject =
    JsonObject(ListMap(selectors.getOrElse(Map.empty).toSeq.map { case (k, sel) =>
      k -> (JsonString(e.getField(sel)): JsonValue)
    }: _*))
}

/** Config-driven Amplitude event emission
  * (reference: src/main/scala/com/mozilla/telemetry/pings/Ping.scala:292-394).
  */
trait SendsToAmplitude {
  import AmplitudeJson._

  def events: Seq[TelemetryEvent]
  def meta: Meta
  def getClientId: Option[String]
  def sessionStart: Long
  def getOsName: Option[String]
  def getOsVersion: Option[String]
  def getCreated: Option[Long]

  /** Ping-level properties merged into every event payload. */
  def pingAmplitudeProperties: JsonObject = JsonObject.of()

  /** Optional ping-level pseudo-events (main ping's session_split). */
  def sessionSplitEvents: Seq[TelemetryEvent] = Seq.empty

  private def filterProperties: Map[String, String] =
    Map("os" -> getOsName.getOrElse(""), "created" -> getCreated.getOrElse(0L).toString)

  /** Stable dedup key — must not change across deploys
    * (reference: Ping.scala:310-327).
    */
  def mkInsertId(items: Any*): String =
    items.map {
      case Some(item) => item.toString
      case None       => "None"
      case item       => item.toString
    }.mkString("-")

  def getFullEventName(groupName: String, eventName: String): String =
    s"$groupName - $eventName"

  def eventToAmplitudeEvent(eventGroup: String, e: TelemetryEvent, es: AmplitudeEvent): JsonValue = {
    val sessionIdOffset = Try(es.sessionIdOffset.map(o => e.getField(o).toLong)) match {
      case Success(Some(x)) => x
      case _                => 0L
    }
    val insertId = mkInsertId(getClientId, sessionStart, es.name,
      e.timestamp, e.category, e.method, e.obj)

    merge(pingAmplitudeProperties, jobj(
      ("session_id", n(sessionStart + sessionIdOffset)),
      ("insert_id", s(insertId)),
      ("event_type", s(getFullEventName(eventGroup, es.name))),
      ("time", n(e.timestamp + sessionStart)),
      ("event_properties", Some(properties(e, es.amplitudeProperties))),
      ("user_properties", Some(properties(e, es.userProperties))),
      ("app_version", so(meta.appVersion)),
      ("os_name", so(getOsName)),
      ("os_version", so(getOsVersion)),
      ("country", so(meta.geoCountry)),
      ("city", so(meta.geoCity))))
  }

  /** Match each event against every configured schema; first match wins
    * (reference: Ping.scala:354-377).
    */
  def getAmplitudeEvents(config: AmplitudeConfig): Option[KeyedAmplitudePayload] = {
    val schemas: Seq[(String, AmplitudeEvent)] =
      config.eventGroups.flatMap(g => g.events.map((g.eventGroupName, _)))

    val eventsList = (sessionSplitEvents ++ events).flatMap { e =>
      val instance = eventInstance(e)
      schemas.find { case (_, es) => SchemaValidator.validates(es.schema, instance) }
        .map { case (gn, es) => eventToAmplitudeEvent(gn, e, es) }
    }
    if (eventsList.isEmpty) None
    else Some(KeyedAmplitudePayload(getClientId.getOrElse(""), eventsList.map(_.render)))
  }

  /** Client sampling + non-top-level filters
    * (reference: Ping.scala:382-393).
    */
  def includePing(sample: Double, config: AmplitudeConfig): Boolean = {
    val keepClient = meta.sampleId.getOrElse(sample * 100) < (sample * 100)
    keepClient && config.nonTopLevelFilters.forall { case (prop, allowedVals) =>
      allowedVals.contains(filterProperties(prop))
    }
  }
}

/** Environment-backed ping-level user properties
  * (reference: Ping.scala:423-451).
  */
trait SendsToAmplitudeWithEnvironment extends SendsToAmplitude {
  import AmplitudeJson._

  def getExperiments: Array[(Option[String], Option[String])]

  override def pingAmplitudeProperties: JsonObject = {
    val experiments = getExperiments.collect {
      case (Some(exp), Some(branch)) => s"${exp}_$branch"
    }.toVector
    jobj(
      ("user_properties", Some(jobj(
        ("channel", s(meta.normalizedChannel)),
        ("sample_id", no(meta.sampleId)),
        ("app_build_id", so(meta.appBuildId)),
        ("app_name", s(meta.appName)),
        ("locale", so(meta.settings.flatMap(_.locale))),
        ("is_default_browser", bo(meta.settings.flatMap(_.isDefaultBrowser))),
        ("country", so(meta.geoCountry)),
        ("env_build_arch", so(meta.environmentBuild.flatMap(_.architecture))),
        ("is_wow64", bo(meta.system.flatMap(_.isWow64))),
        ("memory_mb", no(meta.system.flatMap(_.memoryMB))),
        ("profile_creation_date", so(meta.profile.flatMap(_.normalizedCreationDate))),
        ("source", so(meta.settings.flatMap(_.attribution).flatMap(_.source))),
        ("experiments", Some(JsonArray(experiments.map(JsonString(_): JsonValue))))))),
      ("user_id", so(getClientId)))
  }
}

object SendsToAmplitude {
  /** docType + appName → concrete ping (reference: Ping.scala:396-421). */
  def fromEnvelope(env: Envelope): SendsToAmplitude = {
    val docType = env.fieldString("docType")
    val appName = env.fieldString("appName")
    (docType, appName) match {
      case (Some("focus-event"), Some("Focus"))           => FocusEventPing.fromEnvelope(env)
      case (Some("focus-event"), Some("Zerda"))           => RocketEventPing.fromEnvelope(env)
      case (Some("focus-event"), Some(x)) =>
        throw new IllegalArgumentException(s"Expect Focus or Zerda for focus-event appName, but we got $x")
      case (Some("mobile-event"), Some("FirefoxForFireTV")) => FireTvEventPing.fromEnvelope(env)
      case (Some("mobile-event"), Some("Fennec"))           => MobileEventPing.fromEnvelope(env)
      case (Some("mobile-event"), Some(x)) =>
        throw new IllegalArgumentException(s"Expect FirefoxForFireTV or Fennec for mobile-event appName, but we got $x")
      case (Some("main"), _)  => MainPing.fromEnvelope(env)
      case (Some("event"), _) => EventPing.fromEnvelope(env)
      case (Some(x), _) => throw new IllegalArgumentException(s"Unexpected doctype $x")
      case _            => throw new IllegalArgumentException("No doctype found")
    }
  }
}
