package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the star-schema corpus (TESTDATA.md).
  *
  * Mirrors the reference's partition-pruned batch scans
  * (reference: src/main/scala/com/mozilla/telemetry/streaming/ErrorAggregatorBase.scala:181-197)
  * re-expressed as plain Catalyst file scans: filters placed on the
  * returned DataFrame reach the parquet reader as PushedFilters, and
  * column selection prunes the ReadSchema — no manual file listing.
  */
object Tables {
  /** Sessions reading the events table must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` at build time (the file
    * stores TIMESTAMP(NANOS), which Spark 4 otherwise rejects; [[events]]
    * converts the raw longs back to TimestampType). Bench, Verify, and
    * the test harness all do; `load` itself never mutates session conf.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Event log with a true TimestampType event-time column, normalized
    * across every encoding the corpus generator has shipped:
    *   - INT64 TIMESTAMP(NANOS): read as LongType under
    *     `nanosAsLong=true`; integer DIV (not double math) truncates to
    *     the microsecond exactly like an engine-native ns→µs cast would.
    *   - timestamp[us] with isAdjustedToUTC=false: Spark 4 infers
    *     TIMESTAMP_NTZ (`spark.sql.parquet.inferTimestampNTZ.enabled`
    *     defaults true); event-time ops (`window`, casts to long) need
    *     an instant, so cast to TimestampType — the session timezone is
    *     UTC in every harness session, so the wall-clock is preserved
    *     and `cast(ts as long)` matches the DuckDB oracle's `epoch()`.
    *   - timestamp[us] UTC-adjusted: already TimestampType, pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
