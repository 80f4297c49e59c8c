package graft.pings

import graft.json._

/** Crash ping with process-type classification
  * (reference: src/main/scala/com/mozilla/telemetry/pings/CrashPing.scala).
  */
final case class CrashPing(
    application: Option[Application],
    meta: Meta,
    processType: Option[String],
    startupCrash: Option[String],
    ipcChannelError: Option[String])
  extends TelemetryPing with HasEnvironment with HasApplication {

  /** Fennec mis-reports Linux in crash pings → Android
    * (reference: CrashPing.scala:17-26).
    */
  override def getOsName: Option[String] = {
    val reported = meta.system.flatMap(_.os).map(_.name)
    if (meta.appName == "Fennec" && reported.contains("Linux")) Some("Android")
    else reported
  }

  def isMainCrash: Boolean = processType.getOrElse("main") == "main"
  def isContentCrash: Boolean = processType.contains("content")
  def isContentShutdownCrash: Boolean = ipcChannelError.contains("ShutDownKill")
  def isStartupCrash: Boolean = startupCrash.getOrElse("0") == "1"
}

object CrashPing {
  def fromEnvelope(env: Envelope): CrashPing = {
    val payload = env.payloadJson
    val crash = payload \ "payload"
    CrashPing(
      application = Application.fromJson(payload \ "application"),
      meta = Meta.fromEnvelope(env),
      processType = (crash \ "processType").asString,
      startupCrash = (crash \ "metadata" \ "StartupCrash").coerceString,
      ipcChannelError = (crash \ "metadata" \ "ipc_channel_error").asString)
  }
}
