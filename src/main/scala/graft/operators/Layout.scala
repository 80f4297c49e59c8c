package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale. Partition pruning
  * (EnvelopeStore) eliminates whole directories by partition column;
  * Z-ORDER clustering makes per-FILE min/max statistics selective on
  * MULTIPLE columns at once: interleaving the bits of two dimensions
  * makes z-adjacent rows adjacent in both, so a file holding a z-range
  * holds a tight rectangle in (a, b) — a predicate on EITHER column
  * prunes most files, where a single-column sort makes the second
  * column's min/max ranges span everything. The 100 TB lever: the same
  * parquet bytes, rewritten in z-order, turn full scans into few-file
  * reads for two-dimensional slices.
  */
object Layout {

  /** Morton (Z-order) key: interleaves the low `bits` bits of two
    * non-negative integer columns — bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Pure integer shifts and ors (codegen'd, no
    * HOF, no shuffle); values must already be bucketed into
    * [0, 2^bits) — compose with pmod/width_bucket upstream.
    */
  def zOrderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.cast("long").bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.cast("long").bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Monotone bucketing of an integer-valued column into [0, 2^bits) —
    * the upstream companion [[zOrderKey]]'s contract asks for. MONOTONE
    * (equal-width, via width_bucket) is the requirement: a modular map
    * like pmod would scatter adjacent values across buckets and destroy
    * exactly the locality z-ordering exists to create. Values outside
    * [minV, maxV] clamp to the edge buckets.
    */
  def zBucket(c: Column, minV: Long, maxV: Long, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    require(maxV >= minV, s"need maxV >= minV, got [$minV, $maxV]")
    val n = 1L << bits
    greatest(lit(0L), least(lit(n - 1),
      width_bucket(c.cast("double"), lit(minV.toDouble),
        lit(maxV.toDouble + 1.0), lit(n)) - 1))
  }

  /** Rewrite a DataFrame into z-ordered layout: range-partition by the
    * z-key (so files cover contiguous z-ranges → tight min/max on both
    * dimensions) and sort within partitions. One exchange; follow with
    * `.write.parquet(...)` — the per-file stats then prune on either
    * dimension. */
  def repartitionByZOrder(df: DataFrame, a: Column, b: Column,
                          numPartitions: Int, bits: Int = 16): DataFrame = {
    val z = zOrderKey(a, b, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
