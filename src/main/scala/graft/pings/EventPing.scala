package graft.pings

import graft.json._

/** Event ping: per-process positional event arrays under payload.events
  * (reference: src/main/scala/com/mozilla/telemetry/pings/EventPing.scala).
  */
final case class EventPing(
    application: Option[Application],
    meta: Meta,
    eventsByProcessJson: JsonValue,
    lostEventsCount: Option[Int],
    processStartTimestamp: Long,
    reason: Option[String],
    sessionId: Option[String],
    subsessionId: Option[String])
  extends TelemetryPing with HasEnvironment with HasApplication
  with graft.amplitude.SendsToAmplitudeWithEnvironment {

  def getCreated: Option[Long] = meta.creationTimestamp.map(t => (t / 1e9).toLong)

  /** process name → its events (reference: EventPing.scala:18-21). */
  val processEventMap: Map[String, Seq[TelemetryEvent]] =
    MainPing.ProcessNames.map { p =>
      p -> TelemetryPing.extractEvents(eventsByProcessJson \ p, List(Nil))
    }.toMap

  val events: Seq[TelemetryEvent] = MainPing.ProcessNames.flatMap(processEventMap(_))

  def getClientId: Option[String] = meta.clientId
  def sessionStart: Long = processStartTimestamp
  def getLocale: Option[String] = meta.settings.flatMap(_.locale)

  /** experiments as id→branch map, None when empty
    * (reference: EventPing.scala:31-41).
    */
  def getMSStyleExperiments: Option[Map[String, String]] = {
    val m = getExperiments.collect { case (Some(id), Some(branch)) => id -> branch }.toMap
    if (m.isEmpty) None else Some(m)
  }

  def getNormandyEvents: Seq[TelemetryEvent] = events.filter(_.category == "normandy")

  def getUptakeEvents: Seq[TelemetryEvent] =
    events.filter(e => e.category == "normandy" || e.category == "uptake.remotecontent.result")
}

object EventPing {
  def fromEnvelope(env: Envelope): EventPing = {
    val submission = env.payloadJson
    val payload = submission \ "payload"
    EventPing(
      application = Application.fromJson(submission \ "application"),
      meta = Meta.fromEnvelope(env),
      eventsByProcessJson = payload \ "events",
      lostEventsCount = (payload \ "lostEventsCount").asInt,
      processStartTimestamp = (payload \ "processStartTimestamp").asLong
        .getOrElse(throw new IllegalArgumentException("event ping without processStartTimestamp")),
      reason = (payload \ "reason").asString,
      sessionId = (payload \ "sessionId").asString,
      subsessionId = (payload \ "subsessionId").asString)
  }
}
