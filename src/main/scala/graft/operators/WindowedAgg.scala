package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation — the reference's core operator
  * (reference: src/main/scala/com/mozilla/telemetry/streaming/ErrorAggregatorBase.scala:238-255).
  *
  * One code path serves both batch and streaming, exactly as the reference
  * does: on a batch DataFrame `withWatermark` is a no-op and `window()` is
  * an ordinary grouping expression; on a stream the same plan gets
  * StateStoreRestore/Save with watermark-driven emission.
  *
  * Scale notes: this is Spark's two-phase HashAggregate — partial
  * (map-side) combine happens before the single shuffle on
  * (window, dims), so input volume shrinks before the exchange. At 100 TB
  * the cardinality that matters is |windows| × |dims|, not row count.
  */
object WindowedAgg {

  /** groupBy(window(ts, duration) + dims).agg(aggs), window struct replaced
    * by flat `window_start`/`window_end` columns (reference renames the
    * same way — ErrorAggregatorBase.scala:238-242).
    */
  def tumbling(
      df: DataFrame,
      tsCol: String,
      duration: String,
      watermark: String,
      dims: Seq[Column],
      aggs: Seq[Column]): DataFrame = {
    val withWm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    withWm
      .groupBy(window(col(tsCol), duration) +: dims: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Offset tumbling window (reference: frecency job's 30-minute window
    * with a 28-minute startTime offset —
    * FederatedLearningSearchOptimizer.scala:97).
    */
  def tumblingOffset(
      df: DataFrame,
      tsCol: String,
      duration: String,
      offset: String,
      watermark: String,
      dims: Seq[Column],
      aggs: Seq[Column]): DataFrame = {
    val withWm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    withWm
      .groupBy(window(col(tsCol), duration, duration, offset) +: dims: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }
}
