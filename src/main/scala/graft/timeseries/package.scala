package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.collection.mutable.ListBuffer
import scala.reflect.runtime.universe._
import scala.util.{Failure, Success, Try}

/** Runtime-composed schemas and positional rows — the mechanism behind
  * per-job output schemas assembled as dimensions ⊕ metrics ⊕ histograms
  * (reference: src/main/scala/com/mozilla/telemetry/timeseries/package.scala:15-79,
  * composition at streaming/ErrorAggregatorBase.scala:223-226).
  */
package object timeseries {

  class SchemaBuilder(private val fields: ListBuffer[StructField] = ListBuffer()) {
    def add[T: TypeTag](name: String): SchemaBuilder = {
      val dt = typeOf[T] match {
        case t if t =:= typeOf[Map[String, String]] => MapType(StringType, StringType, true)
        case t if t =:= typeOf[String]    => StringType
        case t if t =:= typeOf[Boolean]   => BooleanType
        case t if t =:= typeOf[Float]     => FloatType
        case t if t =:= typeOf[Double]    => DoubleType
        case t if t =:= typeOf[Long]      => LongType
        case t if t =:= typeOf[Int]       => IntegerType
        case t if t =:= typeOf[Timestamp] => TimestampType
        case t if t =:= typeOf[Date]      => DateType
        case t => throw new IllegalArgumentException(s"Unsupported type $t for field $name")
      }
      fields += StructField(name, dt, nullable = true)
      this
    }
    def build: StructType = StructType(fields.toList)
  }

  object SchemaBuilder {
    def merge(parts: StructType*): StructType =
      StructType(parts.filter(_ != null).flatMap(_.fields))
  }

  /** Positional row fill by field name. Absent names are ignored unless
    * `failOnMissingField`; `None` values leave the slot null.
    */
  class RowBuilder(schema: StructType, failOnMissingField: Boolean = false) extends Serializable {
    private val container = Array.fill[Any](schema.length)(null)

    def update(name: String, value: Option[Any]): Unit =
      Try(schema.fieldIndex(name)) match {
        case Success(i) => value.foreach(container(i) = _)
        case Failure(e) => if (failOnMissingField) throw e
      }

    def build: Row = Row.fromSeq(container.toSeq)
  }

  object RowBuilder {
    def merge(a: Row, b: Row): Row = Row.fromSeq(a.toSeq ++ b.toSeq)
  }
}
