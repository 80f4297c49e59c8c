package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state.
  *
  * The reference's jobs never join streams (each pipeline is a single
  * parse→window→aggregate chain — SURVEY.md §2.4); this operator adds the
  * missing family the engine needs for enrichment workloads (e.g. join
  * clicks to the impression that caused them). The watermark + interval
  * condition is what lets Spark GC join state: each side buffers only
  * rows younger than watermark + interval, so state is bounded by recent
  * traffic, not stream history — the property that keeps a 100 TB/day
  * dual-stream join runnable.
  */
object StreamJoins {

  /** Inner-joins `left` rows to `right` rows with equal join keys whose
    * event time lies in `[leftTs − interval, leftTs]`. Both inputs must
    * be streaming DataFrames with event-time columns; key/timestamp
    * column names must differ between the two sides (standard Spark
    * stream-stream join constraint on ambiguous references).
    */
  def joinWithinInterval(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      watermarkDelay: String,
      intervalSeconds: Long): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $intervalSeconds SECONDS") &&
        col(rightTs) <= col(leftTs))
  }

  /** Stream-static enrichment: join a stream against a (small) static
    * dimension table, re-read per micro-batch and broadcast — the
    * stateless sibling of the interval join (no watermark needed on the
    * static side, no join state at all; Spark re-plans the static side
    * each batch, so a dimension refresh on disk is picked up live).
    * `left` (default) keeps stream rows that miss the dimension.
    *
    * Joins on a USING column (the dim key renamed to the stream key):
    * a raw `col(streamKey) === col(dimKey)` condition is ambiguous when
    * both sides share the key name and leaks a duplicate key column
    * when they don't — USING resolves both and emits the key once.
    *
    * Schema change: in the output, the dimension's `dimKey` column
    * appears under the name `streamKey` (merged into the single USING
    * key column). A dimension that ALREADY has a distinct column named
    * `streamKey` alongside `dimKey` is rejected — the rename would
    * produce two same-named columns and the join would fail with an
    * opaque ambiguity error downstream.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String,
      joinType: String = "left"): DataFrame = {
    require(dimKey == streamKey || !dim.columns.contains(streamKey),
      s"dim already has a column named '$streamKey' distinct from its key '$dimKey'; " +
        "rename it before enriching (the dim key is exposed as the stream key)")
    val d = if (dimKey == streamKey) dim else dim.withColumnRenamed(dimKey, streamKey)
    stream.join(broadcast(d), Seq(streamKey), joinType)
  }
}
