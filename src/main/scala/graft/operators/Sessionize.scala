package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event log.
  *
  * Batch form: one window function pass — a single shuffle on the user key,
  * then a linear scan per user partition (sort within partitions; no
  * global sort). Skewed users are bounded by per-user event counts, not
  * table size, so this survives a 100× scale-up as long as no single user
  * exceeds a partition (true for telemetry-shaped data).
  *
  * The streaming twin of this operator is
  * `groupByKey(user).flatMapGroupsWithState` (session state + timeout);
  * batch analytics over history uses this window-function form.
  */
object Sessionize {

  /** Adds `session_seq`: 1-based session index per user, where a gap of
    * more than `gapSeconds` between consecutive events starts a session.
    */
  def withSessionSeq(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val prevTs = lag(col(tsCol).cast("double"), 1).over(byUser)
    val isNew = when(
      prevTs.isNull || (col(tsCol).cast("double") - prevTs > gapSeconds.toDouble),
      lit(1L)).otherwise(lit(0L))
    events
      .withColumn("session_new", isNew)
      .withColumn("session_seq",
        sum(col("session_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("session_new")
  }

  /** Per-user session count. */
  def sessionCounts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long): DataFrame =
    withSessionSeq(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol))
      .agg(max(col("session_seq")).as("n_sessions"),
           count(lit(1)).as("n_events"))
}
