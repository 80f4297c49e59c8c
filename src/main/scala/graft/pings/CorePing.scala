package graft.pings

import graft.json._

/** Fennec core ping; the submission lives in the `submission` field
  * (reference: src/main/scala/com/mozilla/telemetry/pings/CorePing.scala).
  */
final case class CorePing(
    arch: Option[String],
    displayVersion: Option[String],
    durations: Option[Long],
    meta: Meta,
    os: Option[String],
    osversion: Option[String])
  extends TelemetryPing {

  /** Fennec experiments differ from desktop → null-experiment row only
    * (reference: CorePing.scala:20-23).
    */
  override def getExperiments: Array[(Option[String], Option[String])] = Array((None, None))
  override def getVersion: Option[String] = meta.appVersion
  override def getDisplayVersion: Option[String] = displayVersion.orElse(meta.appVersion)
  override def getOsName: Option[String] = os
  override def getOsVersion: Option[String] = osversion
  override def getArchitecture: Option[String] = arch
  override protected def getRawBuildId: Option[String] = meta.appBuildId

  def usageHours: Option[Float] =
    durations.map(_.toFloat / TelemetryPing.SecondsPerHour)
}

object CorePing {
  def fromEnvelope(env: Envelope): CorePing = {
    val sub = env.payloadJson
    CorePing(
      arch = (sub \ "arch").asString,
      displayVersion = (sub \ "displayVersion").asString,
      durations = (sub \ "durations").asLong,
      meta = Meta.fromEnvelope(env),
      os = (sub \ "os").asString,
      osversion = (sub \ "osversion").coerceString)
  }
}
