package graft.monitoring

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentHashMap

/** `observe()`-based pipeline metrics — the fully-public successor to
  * the accumulator bridge ([[AccumulatorMetrics]]; reference:
  * src/main/scala/org/apache/spark/metrics/source/custom/AccumulatorMetricsSource.scala:38-93,
  * which reaches into Spark's package-private metrics Source; SURVEY.md
  * §4 names `observe()` as the idiomatic re-expression).
  *
  * Metrics are aggregate expressions evaluated INSIDE the plan — no
  * polling thread, no second pass over the data, exactly-once per
  * completed (micro-)batch. Batch queries surface them through a
  * [[QueryExecutionListener]] (see [[ObservedMetrics.listen]]);
  * streaming queries through `StreamingQueryProgress.observedMetrics`
  * keyed by the same observation name.
  */
object ObservedMetrics {

  /** Attach named aggregate metrics to a DataFrame, e.g.
    * `attach(df, "parse", count(lit(1)).as("rows"),
    *  count(when(col("err").isNotNull, 1)).as("errors"))`.
    */
  def attach(df: DataFrame, name: String, first: Column, rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)

  /** Collects observed metric rows for batch queries, keyed by
    * observation name; register the returned listener's handle with
    * `spark.listenerManager`. Thread-safe; last write per name wins.
    */
  final class Collector extends QueryExecutionListener {
    private val seen = new ConcurrentHashMap[String, Row]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) => seen.put(name, row) }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    def get(name: String): Option[Row] = Option(seen.get(name))
  }
}
