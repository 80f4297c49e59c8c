/* Lives under org.apache.spark.sql to reach private[sql] bridges
 * (ExpressionUtils, sessionState) — the same placement trick the
 * reference uses for its metrics source (reference:
 * src/main/scala/org/apache/spark/metrics/source/custom/AccumulatorMetricsSource.scala:4-6).
 */
package org.apache.spark.sql.graft

import graft.json.Json
import graft.pings.Envelope
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: extract one top-level scalar field from a
  * binary envelope without building the ping domain model. Lets pipelines
  * apply allow-list filters (docType/appName/channel) BEFORE the
  * expensive typed parse — the early-filter stage the reference buries
  * inside its flatMap closures (ErrorAggregatorBase.scala:92-105),
  * expressed where Catalyst can see and reorder it (SURVEY.md §7.4).
  */
case class EnvelopeField(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "envelope_field"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"envelope_field expects (binary, string), got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(bytes: Any, fieldName: Any): Any = {
    try {
      val env = Envelope.parseFrom(bytes.asInstanceOf[Array[Byte]])
      env.fieldString(fieldName.asInstanceOf[UTF8String].toString)
        .map(UTF8String.fromString).orNull
    } catch {
      case _: Exception => null // undecodable envelope → null, filters drop it
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EnvelopeExpressions {

  /** Column-API form. */
  def envelopeField(value: Column, fieldName: String): Column =
    ExpressionUtils.column(
      EnvelopeField(ExpressionUtils.expression(value), Literal(fieldName)))

  /** SQL form: `SELECT envelope_field(value, 'docType') FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "envelope_field",
      exprs => EnvelopeField(exprs.head, exprs(1)),
      "scala_udf")

  /** Reproduce one render of the envelope for tests needing raw JSON. */
  private[graft] def renderField(env: Envelope, name: String): Option[String] =
    env.fields.get(name).map(Json.render)
}
