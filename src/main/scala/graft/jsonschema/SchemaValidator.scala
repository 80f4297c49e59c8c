package graft.jsonschema

import graft.json._

/** JSON-Schema subset validator: `type`, `enum`, `required`, `properties`,
  * `minimum`, `pattern`, `items`, `minItems` — the keywords the shipped
  * Amplitude event-matching schemas use (SURVEY.md §7.2 step 7; reference
  * consumes a full validator library at
  * src/main/scala/com/mozilla/telemetry/pings/Ping.scala:354-377).
  *
  * Unknown keywords are ignored (JSON-Schema semantics); an absent keyword
  * constrains nothing.
  */
object SchemaValidator {

  def validates(schema: JsonValue, instance: JsonValue): Boolean = {
    typeOk(schema \ "type", instance) &&
      enumOk(schema \ "enum", instance) &&
      requiredOk(schema \ "required", instance) &&
      propertiesOk(schema \ "properties", instance) &&
      minimumOk(schema \ "minimum", instance) &&
      patternOk(schema \ "pattern", instance) &&
      itemsOk(schema \ "items", instance) &&
      minItemsOk(schema \ "minItems", instance)
  }

  private def typeOk(t: JsonValue, instance: JsonValue): Boolean = t match {
    case JsonString(name) => typeMatches(name, instance)
    case JsonArray(names) => names.exists(n => n.asString.exists(typeMatches(_, instance)))
    case _                => true
  }

  private def typeMatches(name: String, instance: JsonValue): Boolean = name match {
    case "object"  => instance.isInstanceOf[JsonObject]
    case "array"   => instance.isInstanceOf[JsonArray]
    case "string"  => instance.isInstanceOf[JsonString]
    case "number"  => instance.isInstanceOf[JsonNumber]
    case "integer" => instance match { case n: JsonNumber => n.isWhole; case _ => false }
    case "boolean" => instance.isInstanceOf[JsonBool]
    case "null"    => instance == JsonNull
    case _         => false
  }

  private def enumOk(e: JsonValue, instance: JsonValue): Boolean = e match {
    case JsonArray(allowed) => allowed.contains(instance)
    case _                  => true
  }

  private def requiredOk(r: JsonValue, instance: JsonValue): Boolean = r match {
    case JsonArray(names) => instance match {
      case JsonObject(fields) => names.forall(_.asString.forall(fields.contains))
      case _                  => true // `required` only constrains objects
    }
    case _ => true
  }

  private def propertiesOk(p: JsonValue, instance: JsonValue): Boolean = p match {
    case JsonObject(props) => instance match {
      case JsonObject(fields) =>
        props.forall { case (name, subSchema) =>
          fields.get(name).forall(validates(subSchema, _))
        }
      case _ => true
    }
    case _ => true
  }

  private def minimumOk(m: JsonValue, instance: JsonValue): Boolean = m match {
    case JsonNumber(min) => instance match {
      case JsonNumber(v) => v >= min
      case _             => true
    }
    case _ => true
  }

  private def patternOk(p: JsonValue, instance: JsonValue): Boolean = p match {
    case JsonString(regex) => instance match {
      // JSON-Schema patterns are unanchored substring matches
      case JsonString(s) => regex.r.findFirstIn(s).isDefined
      case _             => true
    }
    case _ => true
  }

  private def itemsOk(i: JsonValue, instance: JsonValue): Boolean = i match {
    case schema if schema.isDefined => instance match {
      case JsonArray(items) => items.forall(validates(schema, _))
      case _                => true
    }
    case _ => true
  }

  private def minItemsOk(m: JsonValue, instance: JsonValue): Boolean = m match {
    case JsonNumber(min) => instance match {
      case JsonArray(items) => items.length >= min
      case _                => true
    }
    case _ => true
  }
}
