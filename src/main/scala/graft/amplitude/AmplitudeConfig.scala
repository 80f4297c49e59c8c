package graft.amplitude

import graft.json._

import scala.collection.immutable.ListMap

/** Config-driven event mapping model (reference:
  * src/main/scala/com/mozilla/telemetry/streaming/EventsToAmplitude.scala:111-144)
  * with structural validation equivalent to the reference's meta-schema
  * check (readConfigFile, EventsToAmplitude.scala:191-206; meta-schema at
  * src/main/resources/schemas/schemaFileSchema.json).
  */
final case class AmplitudeEvent(
    name: String,
    description: String,
    sessionIdOffset: Option[String],
    amplitudeProperties: Option[Map[String, String]],
    userProperties: Option[Map[String, String]],
    schema: JsonValue)

final case class AmplitudeEventGroup(eventGroupName: String, events: List[AmplitudeEvent])

final case class AmplitudeConfig(
    source: String,
    filters: Map[String, List[String]],
    eventGroups: Seq[AmplitudeEventGroup]) {

  val topLevelPingFields: Seq[String] = AmplitudeConfig.TopLevelPingFields(source)

  val topLevelFilters: Map[String, List[String]] =
    filters.filter { case (name, _) => topLevelPingFields.contains(name) }

  val nonTopLevelFilters: Map[String, List[String]] =
    filters.filter { case (name, _) => !topLevelPingFields.contains(name) }

  def getBatchFilters: Map[String, List[String]] =
    filters.map { case (k, v) => k -> v.map(_.replace("-", "_")) }
}

object AmplitudeConfig {

  /** Source dataset → its top-level/partition fields
    * (reference: EventsToAmplitude.scala:47-66).
    */
  val TopLevelPingFields: Map[String, List[String]] = Map(
    "telemetry" -> List("appBuildId", "appName", "appUpdateChannel", "appVersion",
      "clientId", "docType", "geoCity", "geoCountry", "normalizedChannel", "submissionDate"),
    "telemetry-cohorts" -> List("submissionDate", "docType", "experimentId", "experimentBranch"))

  /** Allowed property-selector values (meta-schema `allowedPropertyValues`). */
  private val PropertySelector = "^(timestamp|category|object|method|value|extra\\..+|literal\\..+)$".r

  def parse(text: String): AmplitudeConfig = {
    val j = Json.parse(text)
    validateStructure(j)
    AmplitudeConfig(
      source = (j \ "source").asString.get,
      filters = (j \ "filters").asObject.getOrElse(ListMap.empty).map { case (k, v) =>
        k -> v.asArray.getOrElse(Vector.empty).flatMap(_.asString).toList
      }.toMap,
      eventGroups = (j \ "eventGroups").asArray.get.map { g =>
        AmplitudeEventGroup(
          eventGroupName = (g \ "eventGroupName").asString.get,
          events = (g \ "events").asArray.get.map { e =>
            AmplitudeEvent(
              name = (e \ "name").asString.get,
              description = (e \ "description").asString.getOrElse(""),
              sessionIdOffset = (e \ "sessionIdOffset").asString,
              amplitudeProperties = (e \ "amplitudeProperties").asStringMap,
              userProperties = (e \ "userProperties").asStringMap,
              schema = e \ "schema")
          }.toList)
      })
  }

  def load(filePath: String): AmplitudeConfig =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(filePath)))

  /** Structural meta-validation: fails fast with the reference's contract
    * (required source/eventGroups; known source; filters are string
    * arrays; events carry name + schema; property selectors restricted to
    * `timestamp|category|object|method|value|extra.*|literal.*`).
    */
  private def validateStructure(j: JsonValue): Unit = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Config does not validate against meta-schema: $msg")

    val source = (j \ "source").asString.getOrElse(fail("missing source"))
    if (!TopLevelPingFields.contains(source)) fail(s"unknown source $source")

    (j \ "filters").asObject.foreach(_.foreach { case (name, v) =>
      if (v.asArray.isEmpty || !v.asArray.get.forall(_.asString.isDefined))
        fail(s"filter $name must be an array of strings")
    })

    val groups = (j \ "eventGroups").asArray.getOrElse(fail("missing eventGroups"))
    if (groups.isEmpty) fail("eventGroups must not be empty")
    groups.foreach { g =>
      if ((g \ "eventGroupName").asString.isEmpty) fail("eventGroup missing eventGroupName")
      val events = (g \ "events").asArray.getOrElse(fail("eventGroup missing events"))
      if (events.isEmpty) fail("events must not be empty")
      events.foreach { e =>
        if ((e \ "name").asString.isEmpty) fail("event missing name")
        if (!(e \ "schema").isDefined) fail("event missing schema")
        Seq("amplitudeProperties", "userProperties").foreach { propsKey =>
          (e \ propsKey).asObject.foreach(_.foreach { case (prop, sel) =>
            val selector = sel.asString.getOrElse(fail(s"$propsKey.$prop must be a string"))
            if (PropertySelector.findFirstIn(selector).isEmpty)
              fail(s"$propsKey.$prop has disallowed selector '$selector'")
          })
        }
      }
    }
  }
}
