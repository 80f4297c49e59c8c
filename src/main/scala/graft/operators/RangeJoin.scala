package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) joins that scale.
  *
  * Spark plans a raw `p >= s AND p < e` join as a broadcast-nested-loop
  * (or worse, a cartesian product) — O(|points|·|intervals|) comparisons,
  * which is exactly the plan that dies at 100 TB. Bucketing recovers an
  * equi-join: quantize the range dimension into fixed-width buckets,
  * explode each interval over the buckets it overlaps, equi-join points
  * to intervals on (key, bucket), then re-check the exact predicate.
  * Join fan-out per interval = ⌈len/width⌉ + 1 index rows; comparisons
  * collapse from all-pairs to same-bucket pairs. The bucket width trades
  * index amplification (narrow) against in-bucket false candidates
  * (wide); set it near the typical interval length.
  *
  * (The reference has no joins at all — SURVEY.md §2.4; this is part of
  * the beyond-reference relational layer, the batch twin of the
  * watermarked stream-stream interval join in [[StreamJoins]].)
  */
object RangeJoin {

  /** Join `points` (pKey, pCol, …) to `intervals` (iKey, startCol,
    * endCol, …) where keys match and pCol ∈ [startCol, endCol). All
    * range columns are integral (epoch seconds/days — callers quantize
    * timestamps first, keeping the arithmetic engine-agnostic).
    * Column names must be disjoint between the two sides.
    */
  def pointInInterval(
      points: DataFrame, pKey: String, pCol: String,
      intervals: DataFrame, iKey: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("_bucket",
      floor(col(pCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    pb.join(ib,
        pb(pKey) === ib(iKey) && pb("_bucket") === ib("_bucket") &&
          col(pCol) >= col(startCol) && col(pCol) < col(endCol))
      .drop("_bucket")
  }
}
