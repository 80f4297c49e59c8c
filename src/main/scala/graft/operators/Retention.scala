package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming cohort retention — q122's batch query (users bucketed by
  * FIRST-ACTIVITY week, per (cohort, week offset) distinct active
  * users) as arriving state: per user, one emitted hit for every NEW
  * activity week, carrying that user's cohort week. Any downstream
  * aggregate (count per (cohort_week, week_offset), cohort sizes from
  * the offset-0 rows) reproduces the batch query's rows exactly — the
  * same completions-stream contract as [[Funnel.streamingFunnel]].
  *
  * Correct under REORDERING: the cohort week is a MIN over event time,
  * so it is only final once the watermark guarantees nothing earlier
  * can arrive. Events buffer per user until they ripen (ts ≤
  * watermark), then replay in event-time order — the first ripe event
  * ever processed fixes the cohort, and every later admitted event has
  * ts ≥ the watermark that ripened it, so the fix is provably final.
  * Late events (below the watermark at arrival) are dropped, the
  * standard watermark contract.
  *
  * State shape (the 100 TB sizing argument): one row per user —
  * cohort week (a long, kept forever like the funnel frontier) + the
  * emitted-weeks list TRIMMED to weeks at or above the watermark week
  * (older weeks can never recur, so the list is bounded by the
  * watermark delay in weeks, ~1–2 entries in practice) + the transient
  * above-watermark buffer. Total: bounded by user cardinality, exactly
  * the [[Cdc.streamingLatest]] envelope.
  *
  * `weekSeconds` defaults to the batch query's calendar week; benches
  * shrink it so a bounded replay spans many buckets.
  */
object Retention {

  final case class RetIn(user_id: Long, tsMs: Long,
                         ts: java.sql.Timestamp)
  final case class RetState(cohortWeek: Long, emitted: Seq[Long],
                            buffered: Seq[Long])
  final case class RetentionHit(user_id: Long, cohort_week: Long,
                                week: Long, week_offset: Long)

  def streamingRetention(events: DataFrame, userCol: String, tsCol: String,
                         watermarkDelay: String,
                         weekSeconds: Long = 604800L): Dataset[RetentionHit] = {
    require(weekSeconds > 0, "weekSeconds must be positive")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val weekMs = weekSeconds * 1000L
    val in = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(userCol).cast("long").as("user_id"),
        (col(tsCol).cast("double") * 1000).cast("long").as("tsMs"),
        col(tsCol).as("ts"))
      .as[RetIn]

    def update(user: Long, rows: Iterator[RetIn],
               state: GroupState[RetState]): Iterator[RetentionHit] = {
      val wm = state.getCurrentWatermarkMs()
      val st0 = state.getOption.getOrElse(RetState(-1L, Nil, Nil))
      // NEW rows below the watermark are late → dropped (buffered state
      // entries at or below it ripened on time); see Funnel.update
      val buffered = st0.buffered ++ rows.map(_.tsMs).filter(_ >= wm)
      val (ripe, pending) = buffered.partition(_ <= wm)
      var cohort = st0.cohortWeek
      var emitted = st0.emitted
      val out = Seq.newBuilder[RetentionHit]
      ripe.sorted.foreach { t =>
        val wk = Math.floorDiv(t, weekMs)
        if (cohort < 0) cohort = wk // min of everything admissible: final
        if (!emitted.contains(wk)) {
          emitted = emitted :+ wk
          out += RetentionHit(user, cohort, wk, wk - cohort)
        }
      }
      // weeks strictly below the watermark week can never recur (new
      // arrivals have ts >= wm): trim them so the list stays bounded by
      // the watermark delay, not the user's lifetime
      val wmWeek = Math.floorDiv(wm, weekMs)
      state.update(RetState(cohort, emitted.filter(_ >= wmWeek), pending))
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(math.max(pending.min, wm + 1))
      out.result().iterator
    }

    in.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
