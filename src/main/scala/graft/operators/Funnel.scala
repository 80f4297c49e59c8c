package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming funnel — the ordered-steps product-analytics query (q121's
  * batch [[graft.queries.QueryPack]] `funnel`) as arriving state: per
  * user, the first step-1 event, the first step-2 event STRICTLY AFTER
  * it, and so on; each newly completed step emits one completion event
  * carrying (t1, tk), which any downstream aggregate turns into the
  * batch query's per-step (n_users, avg_secs_from_start) row.
  *
  * Correct under REORDERING, not just choreography: an event only
  * advances the frontier once the watermark has passed its event time —
  * until then it sits in a per-user buffer — so a step completion can
  * never be emitted and then invalidated by a late-but-in-watermark
  * earlier event (the cascade's strictly-after dependency makes eager
  * advancement wrong). Events later than the watermark are dropped by
  * the stateful operator itself, exactly like every other watermarked
  * op.
  *
  * State shape (the 100 TB sizing argument): one FRONTIER row per user
  * ever seen — (step reached, t1, t_prev), three longs, bounded by user
  * cardinality like `Cdc.streamingLatest` — plus a transient buffer of
  * events still above the watermark, bounded by the per-user in-flight
  * rate × watermark delay, drained every time the watermark passes them
  * (an event-time timeout wakes idle users whose buffer ripened with no
  * new arrivals).
  */
object Funnel {

  final case class FunnelIn(user_id: Long, tsMs: Long, step: Int,
                            ts: java.sql.Timestamp)
  final case class BufferedEv(tsMs: Long, step: Int)
  final case class FunnelState(frontier: Int, t1Ms: Long, tPrevMs: Long,
                               buffered: Seq[BufferedEv])
  final case class FunnelCompletion(user_id: Long, step_idx: Int,
                                    step: String,
                                    t1: java.sql.Timestamp,
                                    tk: java.sql.Timestamp)

  /** @param events streaming (userCol, typeCol, tsCol) rows
    * @param steps ordered step names (event types); events of other
    *              types are filtered map-side before any state
    */
  def streamingFunnel(events: DataFrame, userCol: String, typeCol: String,
                      tsCol: String, steps: Seq[String],
                      watermarkDelay: String): Dataset[FunnelCompletion] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val stepArr = steps.toArray
    val in = events
      .withWatermark(tsCol, watermarkDelay)
      .filter(col(typeCol).isin(steps.map(lit): _*))
      .select(col(userCol).cast("long").as("user_id"),
        (col(tsCol).cast("double") * 1000).cast("long").as("tsMs"),
        // map-side step index: the state never stores strings
        steps.tail.zipWithIndex.foldLeft(lit(0)) { case (acc, (s, i)) =>
          when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
        }.as("step"),
        col(tsCol).as("ts"))
      .as[FunnelIn]

    def update(user: Long, rows: Iterator[FunnelIn],
               state: GroupState[FunnelState]): Iterator[FunnelCompletion] = {
      val wm = state.getCurrentWatermarkMs()
      val st0 = state.getOption.getOrElse(FunnelState(0, -1L, -1L, Nil))
      // NEW rows below the watermark are LATE (buffered state events at
      // or below it are not — they were on time at arrival and are now
      // ripe); drop them explicitly rather than trusting the operator's
      // own late filter, because a late event replayed as "ripe" would
      // advance the frontier with a timestamp the batch query ignored
      val buffered = st0.buffered ++
        rows.filter(_.tsMs >= wm).map(r => BufferedEv(r.tsMs, r.step))
      // ripe events (ts <= watermark) are FINAL — nothing earlier can
      // still arrive — so replay them in event-time order against the
      // frontier; ties can't double-advance (strictly-after check)
      val (ripe, pending) = buffered.partition(_.tsMs <= wm)
      var frontier = st0.frontier
      var t1 = st0.t1Ms
      var tPrev = st0.tPrevMs
      val out = Seq.newBuilder[FunnelCompletion]
      ripe.sortBy(e => (e.tsMs, e.step)).foreach { e =>
        if (frontier < stepArr.length && e.step == frontier &&
            (frontier == 0 || e.tsMs > tPrev)) {
          if (frontier == 0) t1 = e.tsMs
          tPrev = e.tsMs
          frontier += 1
          out += FunnelCompletion(user, frontier, stepArr(frontier - 1),
            new java.sql.Timestamp(t1), new java.sql.Timestamp(tPrev))
        }
      }
      state.update(FunnelState(frontier, t1, tPrev, pending))
      // wake when the earliest pending event ripens; dormant (frontier
      // only) when nothing is buffered
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(math.max(pending.map(_.tsMs).min, wm + 1))
      out.result().iterator
    }
    in.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
