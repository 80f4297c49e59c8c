package graft.pings

import graft.json._

import java.sql.Timestamp
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Envelope metadata + environment model, with the reference's
  * normalization rules (reference: src/main/scala/com/mozilla/telemetry/pings/Ping.scala:127-242).
  */
final case class Meta(
    timestamp: Long, // nanoseconds
    appBuildId: Option[String],
    appName: String,
    appVersion: Option[String],
    clientId: Option[String],
    creationTimestamp: Option[Double],
    docType: Option[String],
    documentId: Option[String],
    geoCity: Option[String],
    geoCountry: Option[String],
    normalizedChannel: String,
    os: Option[String],
    sampleId: Option[Double],
    sourceName: Option[String],
    sourceVersion: Option[Int],
    submissionDate: String,
    environmentBuild: Option[EnvironmentBuild],
    settings: Option[Settings],
    system: Option[SystemInfo],
    profile: Option[Profile],
    addons: Option[Addons],
    /** New-style experiments: id → branch. */
    experiments: Map[String, String],
    payloadHistograms: JsonValue,
    payloadKeyedHistograms: JsonValue,
    payloadSimpleMeasurements: JsonValue,
    payloadInfo: JsonValue) {

  /** ns → ms resolution (reference: Ping.scala:169-171). */
  def normalizedTimestamp: Timestamp = new Timestamp(timestamp / 1000000L)

  /** double → int → string, so 42.0 becomes "42" (reference Bug 1507238,
    * Ping.scala:174-176).
    */
  def stringSampleId: Option[String] = sampleId.map(_.toInt.toString)
}

object Meta {
  val DateFormatter: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Epoch-day → ISO-8601 date string (reference: Ping.scala:181-184). */
  def epochDayToIso8601(day: Long): String =
    DateTimeFormatter.ISO_LOCAL_DATE.format(LocalDate.ofEpochDay(day))

  def fromEnvelope(env: Envelope): Meta = Meta(
    timestamp = env.timestamp,
    appBuildId = env.fieldString("appBuildId"),
    appName = env.fieldString("appName").getOrElse(""),
    appVersion = env.fieldString("appVersion"),
    clientId = env.fieldString("clientId"),
    creationTimestamp = env.fieldDouble("creationTimestamp"),
    docType = env.fieldString("docType"),
    documentId = env.fieldString("documentId"),
    geoCity = env.fieldString("geoCity"),
    geoCountry = env.fieldString("geoCountry"),
    normalizedChannel = env.fieldString("normalizedChannel").getOrElse(""),
    os = env.fieldString("os"),
    sampleId = env.fieldDouble("sampleId"),
    sourceName = env.fieldString("sourceName"),
    sourceVersion = env.fieldLong("sourceVersion").map(_.toInt),
    submissionDate = env.fieldString("submissionDate").getOrElse(""),
    environmentBuild = EnvironmentBuild.fromJson(env.fieldJson("environment.build")),
    settings = Settings.fromJson(env.fieldJson("environment.settings")),
    system = SystemInfo.fromJson(env.fieldJson("environment.system")),
    profile = Profile.fromJson(env.fieldJson("environment.profile")),
    addons = Addons.fromJson(env.fieldJson("environment.addons")),
    experiments = env.fieldJson("environment.experiments").asObject
      .map(_.collect { case (id, exp) if (exp \ "branch").asString.isDefined =>
        id -> (exp \ "branch").asString.get })
      .getOrElse(Map.empty),
    payloadHistograms = env.fieldJson("payload.histograms"),
    payloadKeyedHistograms = env.fieldJson("payload.keyedHistograms"),
    payloadSimpleMeasurements = env.fieldJson("payload.simpleMeasurements"),
    payloadInfo = env.fieldJson("payload.info"))
}

final case class EnvironmentBuild(
    version: Option[String],
    buildId: Option[String],
    architecture: Option[String])

object EnvironmentBuild {
  def fromJson(j: JsonValue): Option[EnvironmentBuild] =
    if (!j.isDefined) None
    else Some(EnvironmentBuild(
      (j \ "version").asString,
      (j \ "buildId").coerceString,
      (j \ "architecture").asString))
}

/** OS version normalization: leading `major[.minor[.patch]]` prefix or
  * nothing (reference: Ping.scala:197-208).
  */
final case class OsInfo(name: Option[String], version: Option[String]) {
  val normalizedVersion: Option[String] = version.flatMap { v =>
    val m = OsInfo.VersionRegex.pattern.matcher(v)
    if (m.matches()) Option(m.group(1)) else None
  }
}
object OsInfo {
  val VersionRegex = "(\\d+(\\.\\d+)?(\\.\\d+)?)?.*".r
}

final case class SystemOs(name: String, version: String) {
  def normalizedVersion: Option[String] = OsInfo(Some(name), Some(version)).normalizedVersion
}

final case class SystemInfo(os: Option[SystemOs], isWow64: Option[Boolean], memoryMB: Option[Double])

object SystemInfo {
  def fromJson(j: JsonValue): Option[SystemInfo] =
    if (!j.isDefined) None
    else Some(SystemInfo(
      os = for {
        name <- (j \ "os" \ "name").asString
        version <- (j \ "os" \ "version").coerceString
      } yield SystemOs(name, version),
      isWow64 = (j \ "isWow64").asBool,
      memoryMB = (j \ "memoryMB").asDouble))
}

final case class Profile(creationDate: Option[Long]) {
  /** epoch-day → ISO-8601 (reference: Ping.scala:210-212). */
  def normalizedCreationDate: Option[String] = creationDate.map(Meta.epochDayToIso8601)
}
object Profile {
  def fromJson(j: JsonValue): Option[Profile] =
    if (!j.isDefined) None else Some(Profile((j \ "creationDate").asLong))
}

final case class OldStyleExperiment(id: String, branch: String)

final case class Addons(activeExperiment: Option[OldStyleExperiment])
object Addons {
  def fromJson(j: JsonValue): Option[Addons] =
    if (!j.isDefined) None
    else Some(Addons(for {
      id <- (j \ "activeExperiment" \ "id").asString
      branch <- (j \ "activeExperiment" \ "branch").asString
    } yield OldStyleExperiment(id, branch)))
}

final case class Attribution(source: Option[String])

final case class Settings(
    locale: Option[String],
    isDefaultBrowser: Option[Boolean],
    attribution: Option[Attribution],
    telemetryEnabled: Option[Boolean])
object Settings {
  def fromJson(j: JsonValue): Option[Settings] =
    if (!j.isDefined) None
    else Some(Settings(
      locale = (j \ "locale").asString,
      isDefaultBrowser = (j \ "isDefaultBrowser").asBool,
      attribution =
        if ((j \ "attribution").isDefined) Some(Attribution((j \ "attribution" \ "source").asString))
        else None,
      telemetryEnabled = (j \ "telemetryEnabled").asBool))
}

/** Application block from the submission payload
  * (reference: Ping.scala:281-289).
  */
final case class Application(
    architecture: Option[String],
    buildId: Option[String],
    channel: Option[String],
    name: Option[String],
    version: Option[String],
    displayVersion: Option[String])
object Application {
  def fromJson(j: JsonValue): Option[Application] =
    if (!j.isDefined) None
    else Some(Application(
      (j \ "architecture").asString,
      (j \ "buildId").coerceString,
      (j \ "channel").asString,
      (j \ "name").asString,
      (j \ "version").coerceString,
      (j \ "displayVersion").asString))
}
