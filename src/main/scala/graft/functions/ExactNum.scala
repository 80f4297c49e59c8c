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
  /** Integral decimal for exactly summing floor-scaled values. */
  val DecWide: DecimalType = DecimalType(28, 0)

  /** Order-independent sum of a double column, returned as double.
    * Safe for money-shaped doubles (≤2 stored decimal digits): rounding
    * them at scale 6 has no half-way ambiguity.
    */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-independent mean of a double column, returned as double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Fine-scale variants for FULL-PRECISION small-magnitude doubles
    * (embedding dims, norms). These cannot ride the decimal cast: Spark
    * converts double→decimal through the shortest decimal string
    * (`BigDecimal.valueOf`) while DuckDB rounds the exact binary
    * expansion, so a value sitting just below a half-way point at the
    * target scale rounds UP in one engine and DOWN in the other
    * (observed: 1 of 21,800 rotated embedding values at sf1).
    * floor(x·1e10) is tie-free — both engines run the same IEEE
    * binary64 multiply and truncate the same double — and the scaled
    * integers sum exactly in DECIMAL(28,0) (no overflow below ~10^18
    * rows at unit magnitude).
    */
  def fsum(c: Column): Column =
    sum(floor(c.cast(DoubleType) * lit(1e10)).cast(DecWide)).cast(DoubleType) / lit(1e10)
  def favg(c: Column): Column = fsum(c) / count(lit(1))

  /** DuckDB-equivalent SQL fragments (oracle side of the same contract). */
  def dsumSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
  def davgSql(x: String): String = s"${dsumSql(x)} / COUNT(*)"
  def fsumSql(x: String): String =
    s"CAST(SUM(CAST(FLOOR(CAST($x AS DOUBLE) * 1e10) AS DECIMAL(28,0))) AS DOUBLE) / 1e10"
  def favgSql(x: String): String = s"${fsumSql(x)} / COUNT(*)"
}
