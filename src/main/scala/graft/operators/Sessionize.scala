package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

import java.sql.Timestamp

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
    * `tieBreak` pins the order of equal timestamps — which session a
    * tied row lands in is tie-invariant, but its cumulative session_seq
    * is not, so consumers that key on session_seq (q139) pass a unique
    * column; consumers that only count sessions (q13) don't need one.
    */
  def withSessionSeq(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tieBreak.map(col): _*)
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

  final case class UserEvent(user_id: Long, ts: Timestamp)
  final case class OpenSession(startMs: Long, lastMs: Long, nEvents: Long)
  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Streaming twin of the batch sessionizer: per-user session state via
    * `flatMapGroupsWithState` with event-time timeout. A session closes
    * when a newer event arrives more than `gapSeconds` later (emitted
    * immediately) or when the watermark passes last-event + gap (emitted
    * by timeout). State per user is one OpenSession — bounded regardless
    * of stream length, the property that matters for an unbounded 100 TB
    * stream.
    */
  def streamingSessions(
      events: Dataset[UserEvent],
      gapSeconds: Long,
      watermarkDelay: String = "10 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def update(userId: Long, rows: Iterator[UserEvent],
               state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      def close(s: OpenSession) =
        ClosedSession(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents)

      if (state.hasTimedOut) {
        val out = state.getOption.map(close).toIterator
        state.remove()
        out
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var open = state.getOption
        val closed = Seq.newBuilder[ClosedSession]
        sorted.foreach { e =>
          val t = e.ts.getTime
          open = open match {
            // strictly greater, matching the batch twin's gap rule
            case Some(s) if t - s.lastMs > gapMs =>
              closed += close(s)
              Some(OpenSession(t, t, 1))
            case Some(s) =>
              // a late event above the watermark may precede the open start
              Some(OpenSession(math.min(s.startMs, t), math.max(s.lastMs, t), s.nEvents + 1))
            case None =>
              Some(OpenSession(t, t, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
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
