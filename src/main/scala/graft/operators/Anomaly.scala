package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming volume-anomaly detection — q138's batch query (per
  * (event_type, day) counts tested against the trailing 7-day Poisson
  * baseline, flag when `(n·cnt7 − sum7)² > sum7·cnt7·4`, i.e. a
  * |z| > 2 excursion in integer arithmetic) as arriving state. This
  * completes the product-analytics trio's streaming twins: funnel
  * ([[Funnel.streamingFunnel]]), retention
  * ([[Retention.streamingRetention]]), and the alerting query an
  * operations deployment actually runs continuously — the batch form
  * re-scans the corpus per evaluation; the twin holds 8 longs per
  * event type and emits each day's verdict the moment the watermark
  * seals the day.
  *
  * Correct under REORDERING: a day's count is only TESTED once the
  * watermark guarantees the day can receive nothing more (every
  * possible late arrival for day d has ts < (d+1)·day ≤ watermark ⇒
  * dropped by the admission rule) — so the per-day counts, and
  * therefore the baseline window sums, are final when used. In-flight
  * days accumulate in a pending map; event-time timeouts seal a day
  * even if its type never receives another event.
  *
  * State shape (the 100 TB sizing argument): per event type, the
  * trailing ≤ 7 finalized (day, count) pairs — older days can never
  * enter a future test window, so they are trimmed as each day
  * finalizes — plus the pending partial counts for days inside the
  * watermark horizon. Total: bounded by event-type cardinality × a
  * dozen longs, the smallest state envelope of any twin in the engine.
  *
  * `daySeconds` defaults to the batch query's UTC day; benches shrink
  * it so a bounded replay spans many buckets.
  */
object Anomaly {

  final case class AnomIn(event_type: String, tsMs: Long,
                          ts: java.sql.Timestamp)
  final case class AnomState(history: Seq[(Long, Long)],
                             pending: Seq[(Long, Long)])
  final case class AnomalyHit(event_type: String, d: Long, n: Long,
                              sum7: Long, cnt7: Long)

  def streamingAnomalies(events: DataFrame, typeCol: String, tsCol: String,
                         watermarkDelay: String,
                         daySeconds: Long = 86400L): Dataset[AnomalyHit] = {
    require(daySeconds > 0, "daySeconds must be positive")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val dayMs = daySeconds * 1000L
    val in = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(typeCol).cast("string").as("event_type"),
        (col(tsCol).cast("double") * 1000).cast("long").as("tsMs"),
        col(tsCol).as("ts"))
      .as[AnomIn]

    def update(tpe: String, rows: Iterator[AnomIn],
               state: GroupState[AnomState]): Iterator[AnomalyHit] = {
      val wm = state.getCurrentWatermarkMs()
      val st0 = state.getOption.getOrElse(AnomState(Nil, Nil))
      // merge arrivals into the in-flight per-day counts; rows below
      // the watermark are late → dropped (the admission rule the
      // finality argument above relies on)
      val pmap = scala.collection.mutable.LinkedHashMap(
        st0.pending.map(p => p._1 -> p._2): _*)
      rows.foreach { r =>
        if (r.tsMs >= wm) {
          val d = Math.floorDiv(r.tsMs, dayMs)
          pmap(d) = pmap.getOrElse(d, 0L) + 1L
        }
      }
      // a day is SEALED once no admissible arrival can land in it
      val (ripe, wait) = pmap.toSeq.partition {
        case (d, _) => (d + 1) * dayMs <= wm
      }
      var hist = st0.history
      val out = Seq.newBuilder[AnomalyHit]
      ripe.sortBy(_._1).foreach { case (d, n) =>
        val win = hist.filter { case (hd, _) => hd >= d - 7 && hd <= d - 1 }
        val sum7 = win.map(_._2).sum
        val cnt7 = win.size.toLong
        val dev = n * cnt7 - sum7
        if (cnt7 > 0 && dev * dev > sum7 * cnt7 * 4)
          out += AnomalyHit(tpe, d, n, sum7, cnt7)
        // days below d − 6 can never enter a later day's window
        hist = (hist :+ (d -> n)).filter { case (hd, _) => hd >= d - 6 }
      }
      state.update(AnomState(hist, wait))
      // seal pending days by event time even if the type goes quiet
      if (wait.nonEmpty)
        state.setTimeoutTimestamp(
          math.max((wait.map(_._1).min + 1) * dayMs, wm + 1))
      out.result().iterator
    }

    in.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
