/* org.apache.spark.sql placement for the private[sql] Column bridge —
 * see EnvelopeExpressions.scala. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native codegen'd dot product over `array<float|double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * interprets a lambda per element and allocates an intermediate array
  * per row pair; this expression compiles to a tight primitive loop
  * inside whole-stage codegen — the hot path of every ANN/near-dup
  * pairwise score (SURVEY.md §7.4's "optional custom Expression for
  * perf" slot).
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // always nullable (length-mismatch/null-element ⇒ null) so codegen's
  // ev.isNull is a real variable even over non-nullable inputs
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  private def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(left), elementType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_dot expects array<float|double> inputs, got (${left.dataType}, ${right.dataType})")
    }

  private def get(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  /** NULL on length mismatch or null elements — the same propagation the
    * HOF formulation (zip_with + aggregate) has, so corrupt or truncated
    * embeddings surface as null scores instead of silent partial sums.
    */
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elementType(left).get, elementType(right).get)
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += get(a, lt, i) * get(b, rt, i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(et: DataType, v: String, i: String): String = et match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _         => s"$v.getDouble($i)"
    }
    val (lt, rt) = (elementType(left).get, elementType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += (${getter(lt, a, i)}) * (${getter(rt, b, i)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  def arrayDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ArrayDotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
