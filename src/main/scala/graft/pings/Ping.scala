package graft.pings

import graft.json._

import java.time.LocalDate
import java.time.temporal.ChronoUnit

/** Common ping surface (reference: src/main/scala/com/mozilla/telemetry/pings/Ping.scala:22-57). */
trait TelemetryPing {
  def meta: Meta

  def getExperiments: Array[(Option[String], Option[String])]
  def getVersion: Option[String]
  def getDisplayVersion: Option[String]
  def getOsName: Option[String]
  def getOsVersion: Option[String]
  def getArchitecture: Option[String]
  protected def getRawBuildId: Option[String]

  /** BuildId accepted only when its date is 0–6 months before the
    * submission date (reference: Ping.scala:38-51). Malformed dates
    * throw — callers run under the lenient drop-on-error flatMap.
    */
  def getNormalizedBuildId: Option[String] = getRawBuildId.flatMap { buildId =>
    val buildDate = LocalDate.parse(buildId.slice(0, 8), Meta.DateFormatter)
    val submissionDate = LocalDate.parse(meta.submissionDate, Meta.DateFormatter)
    ChronoUnit.MONTHS.between(buildDate, submissionDate) match {
      case m if m >= 0 && m <= 6 => Some(buildId)
      case _                     => None
    }
  }
}

object TelemetryPing {
  val SecondsPerHour = 3600

  /** Positional event array → typed Event: `[timestamp, category, method,
    * object, value?, extra?]` (reference: Ping.scala:98-124). Non-array
    * elements throw (same strictness).
    */
  def eventFromPositional(j: JsonValue): TelemetryEvent = j match {
    case JsonArray(items) if items.length >= 4 =>
      TelemetryEvent(
        timestamp = items(0).asLong.getOrElse(
          throw new IllegalArgumentException("event timestamp must be a whole number")),
        category = items(1).coerceString.getOrElse(""),
        method = items(2).coerceString.getOrElse(""),
        obj = items(3).coerceString.getOrElse(""),
        value = items.lift(4).filter(_.isDefined).flatMap(_.coerceString),
        extra = items.lift(5).filter(_.isDefined).flatMap(_.asStringMap))
    case other =>
      throw new IllegalArgumentException(s"Expected positional event array, got $other")
  }

  /** Extract events from every container path; a path that resolves to
    * nothing contributes no events, a non-array container throws
    * (reference: Ping.scala:90-124).
    */
  def extractEvents(json: JsonValue, eventPaths: List[List[String]]): Seq[TelemetryEvent] =
    eventPaths.flatMap { path =>
      path.foldLeft(json)(_ \ _) match {
        case JsonArray(items) => items.map(eventFromPositional)
        case JsonUndefined    => Seq.empty
        case other =>
          throw new IllegalArgumentException(
            s"Expected array at ${path.mkString("/")}, got $other")
      }
    }
}

/** A telemetry event (reference: Ping.scala:453-474). */
final case class TelemetryEvent(
    timestamp: Long,
    category: String,
    method: String,
    obj: String,
    value: Option[String],
    extra: Option[Map[String, String]]) {

  /** Property selector used by config-driven mappings:
    * `timestamp|category|method|object|value|extra.*|literal.*`
    * (reference: Ping.scala:460-473).
    */
  def getField(field: String): String = field match {
    case "timestamp" => timestamp.toString
    case "category"  => category
    case "method"    => method
    case "object"    => obj
    case "value"     => value.getOrElse("")
    case f if f.startsWith("extra.")   => extra.getOrElse(Map.empty).getOrElse(f.stripPrefix("extra."), "")
    case f if f.startsWith("literal.") => f.stripPrefix("literal.")
    case _ => ""
  }
}

/** Environment-backed getters + experiment fan-out
  * (reference: Ping.scala:244-271).
  */
trait HasEnvironment { this: TelemetryPing =>

  /** Old-style + new-style experiments plus one (None, None) entry per
    * ping — the null-experiment row every ping contributes. Set-dedup
    * (reference: Ping.scala:246-259).
    */
  override def getExperiments: Array[(Option[String], Option[String])] = {
    val oldStyle = for {
      addons <- meta.addons
      exp <- addons.activeExperiment
    } yield (Some(exp.id), Some(exp.branch))
    val newStyle = meta.experiments.map { case (id, branch) => (Some(id), Some(branch)) }
    (newStyle.toSeq ++ oldStyle :+ ((None, None))).toSet.toArray
  }

  override def getVersion: Option[String] = meta.environmentBuild.flatMap(_.version)
  override def getOsName: Option[String] = meta.system.flatMap(_.os).map(_.name)
  override def getOsVersion: Option[String] = meta.system.flatMap(_.os).flatMap(_.normalizedVersion)
  override def getArchitecture: Option[String] = meta.environmentBuild.flatMap(_.architecture)
  override protected def getRawBuildId: Option[String] = meta.environmentBuild.flatMap(_.buildId)
}

trait HasApplication { this: TelemetryPing =>
  def application: Option[Application]
  override def getDisplayVersion: Option[String] = application.flatMap(_.displayVersion)
}
