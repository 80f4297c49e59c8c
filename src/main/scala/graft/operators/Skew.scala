package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives for hot keys that AQE's skew-join splitting
  * can't always reach (first-stage aggregations, non-join shuffles).
  *
  * Salting is deterministic here — derived from a hash of the row's
  * non-key columns, not `rand()` — so retried tasks produce identical
  * output (speculative execution and stage retries stay correct).
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates on (key, salt) so a
    * hot key spreads over `saltBuckets` reducers; phase 2 merges the
    * partials per key. Count/sum split into partial+final exactly like
    * Spark's own HashAggregate, one level deeper.
    */
  /** `valueTransform` pre-casts the value before the partial sum (e.g.
    * to an exact decimal — sums of any one type re-aggregate without
    * loss, so the two-phase result equals the single-phase one).
    */
  def saltedSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltSource: Column,
      saltBuckets: Int = 16,
      valueTransform: Column => Column = identity): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(saltSource), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(valueTransform(col(valueCol))).as("_partial_sum"),
           count(lit(1)).as("_partial_n"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial_sum")).as(s"sum_$valueCol"),
           sum(col("_partial_n")).as("n"))
  }

  /** Salted broadcast-replicated join for a skewed fact side: the small
    * side is exploded `saltBuckets`× with every salt value, the fact side
    * gets one deterministic salt per row, and the join key becomes
    * (key, salt) — a single hot key now lands on `saltBuckets` tasks.
    * Use when the dimension is too big to broadcast outright but small
    * enough to replicate `saltBuckets`×.
    */
  def saltedJoin(
      skewed: DataFrame,
      dim: DataFrame,
      key: String,
      saltSource: Column,
      saltBuckets: Int = 16): DataFrame = {
    val saltedFact = skewed.withColumn("_salt", pmod(xxhash64(saltSource), lit(saltBuckets)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
