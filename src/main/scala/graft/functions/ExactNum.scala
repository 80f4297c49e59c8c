package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic floating-point aggregation.
  *
  * A plain `sum(double)` depends on partial-aggregation order, so the same
  * query returns a slightly different double on every shuffle layout — and
  * never hash-matches an external oracle. Routing the sum through an exact
  * decimal makes it order-independent and bit-identical across engines:
  * per-row doubles are rounded to a fixed scale (deterministic, IEEE),
  * summed exactly, and only the final value is cast back to double.
  *
  * Cost at scale: decimal sums stay inside Spark's codegen'd two-phase
  * HashAggregate (partial + final), so this adds per-row decimal math but
  * no extra shuffle — acceptable for reporting aggregates; use plain
  * `sum` when cross-engine determinism isn't needed.
  */
object ExactNum {
  val Dec: DecimalType = DecimalType(28, 6)
  /** Wide decimal for unit-scale values (embeddings) needing more scale. */
  val DecFine: DecimalType = DecimalType(28, 10)

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-independent mean of a double column, returned as double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Fine-scale variants for small-magnitude values. */
  def fsum(c: Column): Column = sum(c.cast(DoubleType).cast(DecFine)).cast(DoubleType)
  def favg(c: Column): Column = fsum(c) / count(lit(1))

  /** DuckDB-equivalent SQL fragments (oracle side of the same contract). */
  def dsumSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
  def davgSql(x: String): String = s"${dsumSql(x)} / COUNT(*)"
  def fsumSql(x: String): String =
    s"CAST(SUM(CAST(CAST($x AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE)"
  def favgSql(x: String): String = s"${fsumSql(x)} / COUNT(*)"
}
