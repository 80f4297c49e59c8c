package graft.queries

import graft.Tables
import graft.functions.{ExactNum, TextFunctions, VectorFunctions}
import graft.operators.{Dedup, Sessionize, Similarity, WindowedAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time family: the reference\u2019s windowed aggregations
  * (tumbling/sliding/session), sessionization, as-of and range joins,
  * skew-salted aggregation, and time-series densification over `events`.
  *
  * Mixed into [[QueryPack]]; oracle SQL for each query lives beside its
  * Spark form in [[eventOracles]].
  */
private[queries] trait EventQueries {
  import ExactNum._
  import SqlTwins._


  /** The reference's core operator: 5-minute tumbling window + dims →
    * multi-SUM (ErrorAggregatorBase.scala:238-255), window emitted as
    * epoch seconds.
    */
  def eventWindowSum(s: SparkSession, dir: String): DataFrame =
    WindowedAgg.tumbling(
      Tables.events(s, dir), "ts", "5 minutes", "1 minute",
      Seq(col("event_type")),
      Seq(dsum(col("value")).as("sum_value"), count(lit(1)).as("n_events")))
      .select(col("window_start").cast("long").as("window_start"),
        col("event_type"), col("sum_value"), col("n_events"))

  /** Conditional windowed counts — ExperimentEnrollmentsAggregator's
    * count(when(method==…)) pattern
    * (ExperimentEnrollmentsAggregator.scala:136-143), hourly.
    */
  def eventConditionalWindow(s: SparkSession, dir: String): DataFrame =
    WindowedAgg.tumbling(
      Tables.events(s, dir), "ts", "1 hour", "1 minute", Seq.empty,
      Seq(count(when(col("event_type") === "signup", 1)).as("n_signup"),
          count(when(col("event_type") === "error", 1)).as("n_error"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase")))
      .select(col("window_start").cast("long").as("window_start"),
        col("n_signup"), col("n_error"), col("n_purchase"))

  /** JSON payload field extraction — the reference's json4s `\` walks
    * (MainPing.scala:23-101) as codegen'd get_json_object.
    */
  def eventJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
           (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
           count(lit(1)).as("n"))

  def sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionCounts(Tables.events(s, dir), "user_id", "ts", 1800L)

  /** Structured-Streaming-native session windows (gap-merged), batch
    * form; oracle replicates the merge with a lag/gap running sum.
    */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        col("n_events"))

  /** As-of join: each event picks the most recent order (max order key on
    * ties) of the same user on or before the event's day. Spark lacks a
    * native as-of operator; the scale-correct composition is
    * union-the-streams → one window pass per key (`last` ignoreNulls over
    * the time-ordered union) — a single shuffle on the key, no range-join
    * explosion, no per-event subquery. Day arithmetic stays on epoch
    * integers so both engines agree without timezone coupling.
    */
  def asofLatestOrder(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("user_id") < 20)
      .select(col("user_id").as("key"),
        // floor(), not a cast: cast-to-long truncates toward zero, which
        // diverges from the oracle's floor(epoch/86400) for pre-1970 ts
        floor(col("ts").cast("long") / lit(86400L)).as("d"),
        col("ts").cast("long").as("ts_s"),
        lit(0).as("is_order"), lit(null).cast("long").as("okey"))
    // the order side prunes to the event-side key range BEFORE the
    // shuffle — the window must not scan orders no event can reach
    val od = Tables.orders(s, dir).filter(col("o_custkey") < 20)
      .select(col("o_custkey").as("key"),
        // o_orderdate is TIMESTAMP_NTZ: day number via date difference
        // (no epoch cast exists for NTZ, and this stays timezone-free)
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"),
        col("o_orderkey"))
      .groupBy(col("key"), col("d"))
      .agg(max(col("o_orderkey")).as("okey"))
      .select(col("key"), col("d"), lit(null).cast("long").as("ts_s"),
        lit(1).as("is_order"), col("okey"))
    // same-day orders sort before events (is_order desc), ties among
    // same-day orders resolve to the max key (okey asc + last())
    val w = Window.partitionBy(col("key"))
      .orderBy(col("d").asc, col("is_order").desc, col("okey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(od)
      .withColumn("asof_okey", last(col("okey"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(col("key").as("user_id"), col("ts_s"), col("asof_okey").as("okey"))
  }

  /** Pivot: per-user event counts spread across one column per event
    * type. Values are DECLARED (no driver-side distinct scan to discover
    * them), so the plan is a plain two-phase aggregate.
    */
  def eventTypePivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
  }

  def eventTopUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(dsum(col("value")).as("total_value"), count(lit(1)).as("n_events"))
      .orderBy(col("total_value").desc, col("user_id").asc)
      .limit(20)

  /** Bucketed range join (big-big, self): for every error event, the
    * count of same-user events in the following hour — incident
    * correlation. The bucket trick turns the non-equi time predicate
    * into an equi-join on (user, hour-bucket) — see
    * [[graft.operators.RangeJoin]]; the oracle states the naive
    * inequality join.
    */
  def rangeJoinEvents(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("ts_s"))
    val points = base.select(col("user_id"), col("ts_s"))
    val anchors = base.filter(col("event_type") === "error")
      .select(col("user_id").as("a_user"), col("ts_s").as("a_start"))
      .withColumn("a_end", col("a_start") + 3600L)
    graft.operators.RangeJoin.pointInInterval(
        points, "user_id", "ts_s", anchors, "a_user", "a_start", "a_end",
        bucketWidth = 3600L)
      .groupBy(col("a_user"), col("a_start"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("a_user").as("user_id"), col("a_start").as("anchor_s"),
        col("n_events"))
  }

  /** Sliding (overlapping) event-time windows — 10-minute windows every
    * 5 minutes, so each event lands in two windows. The reference uses
    * only tumbling windows; this exercises Spark's sliding `window()`
    * (the oracle unrolls the two covering window starts per event).
    */
  def slidingWindowCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** LAG-based inter-event gaps per user: total/max gap seconds and
    * session-break count. Gap arithmetic stays on epoch-second longs
    * (exact), and the window orders by (ts_s, event_id) so consecutive
    * differences are the sorted-sequence diffs in both engines.
    */
  def userGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    Tables.events(s, dir).filter(col("user_id") < 50)
      .withColumn("ts_s", col("ts").cast("long"))
      .withColumn("gap", col("ts_s") - lag(col("ts_s"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("gap")).as("sum_gap_s"),
           max(col("gap")).as("max_gap_s"),
           count(when(col("gap") > 1800L, 1)).as("n_breaks"))
  }

  /** Salted two-phase aggregation over a genuinely skewed key: events
    * have ~5 distinct types, so an unsalted groupBy condemns a 1000-
    * executor cluster to 5 reducers. The deterministic salt (hash of
    * event_id, not rand() — retried tasks must reproduce) spreads each
    * hot key over 32 partial aggregates; the final merge re-sums exact
    * decimals, so the answer is bit-identical to the unsalted query —
    * which is exactly what the oracle states.
    */
  def saltedEventSum(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedSum(
        Tables.events(s, dir), "event_type", "value",
        saltSource = col("event_id"), saltBuckets = 32,
        valueTransform = _.cast(ExactNum.Dec))
      .select(col("event_type"),
        col("sum_value").cast("double").as("sum_value"), col("n"))

  /** Array aggregation (collect_set) made deterministic: the collected
    * set is SORTED before any use, so the nondeterministic accumulation
    * order can't leak into results — emitted as a joined string (the
    * cross-engine-stable array representation).
    */
  def collectAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        concat_ws(",", transform(
          slice(sort_array(collect_set(when(col("value") > 99, col("user_id")))), 1, 3),
          _.cast("string"))).as("first_users"),
        count(when(col("value") > 99, 1)).as("n_high"))

  /** UNPIVOT (melt): q43's wide per-user event-count matrix back to
    * long form, zero cells preserved — the wide↔long reshape pair
    * (pivot q43 / unpivot here) a feature-engineering pipeline round-
    * trips through. Uses the Spark 4 `unpivot` Dataset API.
    */
  def unpivotEventCounts(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    eventTypePivot(s, dir)
      .unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
  }

  /** Gap-filled daily event series: `sequence()` generates the full day
    * range so zero-activity days appear explicitly — the densification
    * step time-series reporting needs before window math. The generator
    * explodes from ONE driver-free row (min/max come from an aggregate),
    * so the series never routes through the driver.
    */
  def gapFilledDaily(s: SparkSession, dir: String): DataFrame = {
    // floor(), not a cast: the oracle floors epoch/86400, and for
    // pre-1970 (negative) timestamps a double divide + cast-to-long
    // truncates toward zero instead of flooring. (Spark's `div` also
    // truncates — IntegralDivide uses integral quot semantics.)
    val ev = Tables.events(s, dir)
      .select(floor(col("ts").cast("long") / lit(86400L)).as("d"))
    val perDay = ev.groupBy(col("d")).agg(count(lit(1)).as("n_events"))
    val days = ev.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    days.join(perDay, Seq("d"), "left")
      .select(col("d"), coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Daily-volume anomaly gate (q138) — the monitoring query the
    * reference's aggregators feed dashboards for (error spikes,
    * enrollment surges): per (event_type, day), flag days whose count
    * deviates from the trailing-7-day mean by more than 2 Poisson
    * standard deviations. A fixed multiplicative gate can't scale —
    * relative daily noise shrinks as 1/√volume, so "2× the mean" fires
    * only on tiny corpora; the Poisson-z form ((n−μ)² > 4μ) is
    * volume-adaptive. ENTIRELY integer arithmetic, cross-multiplied to
    * clear the μ = sum7/cnt7 fraction: `(n·cnt7 − sum7)² > 4·sum7·cnt7`
    * — no float can flip a flag cross-engine (the squared term needs
    * DECIMAL past ~10⁹ events/day/type; longs carry every realistic
    * per-type daily volume). One day-rollup exchange + one RANGE-framed
    * window on the same (event_type) partitioning.
    */
  def eventAnomalies(s: SparkSession, dir: String): DataFrame =
    eventAnomaliesCore(Tables.events(s, dir))

  /** [[eventAnomalies]]'s core — exposed for the planted-spike spec. */
  private[graft] def eventAnomaliesCore(events: DataFrame): DataFrame = {
    val perDay = events
      .select(col("event_type"),
        floor(col("ts").cast("long") / lit(86400L)).as("d"))
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rangeBetween(-7, -1)
    val dev = col("n") * col("cnt7") - col("sum7")
    perDay
      .withColumn("sum7", sum(col("n")).over(w))
      .withColumn("cnt7", count(col("n")).over(w))
      .filter(col("cnt7") > 0 && dev * dev > col("sum7") * col("cnt7") * 4)
      .select(col("event_type"), col("d"), col("n"), col("sum7"), col("cnt7"))
  }

  /** Session co-occurrence mining (q139) — market-basket support over
    * gap-sessionized activity: for each event-type pair, the number of
    * sessions containing BOTH (distinct-per-session first, so dense
    * sessions don't inflate support). Top-20 by support. The pair join
    * is keyed by (user, session) with ≤ |event types| rows per key —
    * bounded fan-out regardless of session length.
    */
  def sessionPairs(s: SparkSession, dir: String): DataFrame =
    sessionPairsCore(Tables.events(s, dir))

  /** [[sessionPairs]]'s core — exposed for the hand-session spec. */
  private[graft] def sessionPairsCore(events: DataFrame): DataFrame = {
    val ev = Sessionize.withSessionSeq(events, "user_id", "ts",
        1800L, tieBreak = Seq("event_id"))
      .select(col("user_id"), col("session_seq"), col("event_type"))
      .distinct()
    val a = ev.select(col("user_id"), col("session_seq"), col("event_type").as("t1"))
    val b = ev.select(col("user_id"), col("session_seq"), col("event_type").as("t2"))
    a.join(b, Seq("user_id", "session_seq"))
      .filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("t1").asc, col("t2").asc)
      .limit(20)
  }

  /** Funnel analysis — the product-analytics query the reference's
    * Amplitude sink feeds downstream (SendsToAmplitude ships events TO
    * Amplitude; this computes the funnel IN-engine): per user, the
    * first 'view', the first 'click' STRICTLY AFTER that view, the
    * first 'purchase' strictly after that click — per step, users
    * reaching it and their mean seconds-from-funnel-start. Ordered
    * semantics (each step must follow the PREVIOUS step's timestamp,
    * not merely exist) is what separates a funnel from three counts.
    *
    * Engine shape: one filtered min-aggregate per step plus a per-user
    * equi-join onto the previous step's frontier — every join keys on
    * user_id (same hash partitioning reused down the cascade), and the
    * per-step output is a 1-row aggregate. No window over the raw
    * event stream, no per-user event sort.
    */
  def funnel(s: SparkSession, dir: String): DataFrame =
    funnelSteps(Tables.events(s, dir), Seq("view", "click", "purchase"))

  /** [[funnel]]'s core over any ordered step list — exposed for the
    * spec's hand-built event sequences. */
  private[graft] def funnelSteps(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("tk"))
      .withColumn("t1", col("tk"))
    def stepRow(idx: Int, name: String, frontier: DataFrame): DataFrame =
      frontier.agg(count(lit(1)).as("n_users"),
          davg((col("tk").cast("long") - col("t1").cast("long")).cast("double"))
            .as("avg_secs_from_start"))
        .select(lit(idx.toLong).as("step_idx"), lit(name).as("step"),
          col("n_users"), col("avg_secs_from_start"))
    var out = stepRow(1, steps.head, cur)
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      cur = events.filter(col("event_type") === st)
        .join(cur.select(col("user_id"), col("t1"), col("tk").as("t_prev")),
          Seq("user_id"))
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("user_id"), col("t1")).agg(min(col("ts")).as("tk"))
      out = out.unionByName(stepRow(i + 1, st, cur))
    }
    out
  }

  /** Cohort retention — users bucketed by FIRST-ACTIVITY week (epoch
    * weeks: floor(epoch/604800), no calendar/timezone ambiguity), then
    * for each (cohort, week offset) the distinct users active that
    * week and the cohort's retention in ppm. The second classic
    * product-analytics read over the reference's event stream.
    *
    * Engine shape: activity de-dups to (user, week) FIRST (the corpus-
    * scale reduction — everything after is user×week sized), cohorts
    * are a per-user min, the sizes table is cohort-count sized and
    * joins broadcast. All keys are user_id or cohort_week — two hash
    * aggregates and two equi-joins, no window.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame =
    cohortRetentionEvents(Tables.events(s, dir))

  /** [[cohortRetention]]'s core — exposed for the spec's planted
    * cohort fixtures. Needs (user_id, ts). */
  private[graft] def cohortRetentionEvents(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), floor(col("ts").cast("long") / lit(604800L)).as("week"))
      .distinct()
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy(col("cohort_week"))
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .withColumn("retention_ppm",
        floor(col("n_active") * lit(1000000L) / col("cohort_size")).cast("long"))
      .select(col("cohort_week").cast("long").as("cohort_week"), col("week_offset").cast("long").as("week_offset"),
        col("n_active"), col("cohort_size"), col("retention_ppm"))
  }

  private[queries] def eventOracles: Map[String, String] = Map(
    "q121_funnel" ->
      s"""WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
         |  WHERE event_type = 'view' GROUP BY user_id),
         |s2 AS (SELECT e.user_id, s1.t1, MIN(e.ts) AS tk FROM events e
         |  JOIN s1 ON e.user_id = s1.user_id
         |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id, s1.t1),
         |s3 AS (SELECT e.user_id, s2.t1, MIN(e.ts) AS tk FROM events e
         |  JOIN s2 ON e.user_id = s2.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts > s2.tk GROUP BY e.user_id, s2.t1)
         |SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step, COUNT(*) AS n_users,
         | ${davgSql("0.0")} AS avg_secs_from_start FROM s1
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), 'click', COUNT(*),
         | ${davgSql("CAST(floor(epoch(tk)) - floor(epoch(t1)) AS DOUBLE)")} FROM s2
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), 'purchase', COUNT(*),
         | ${davgSql("CAST(floor(epoch(tk)) - floor(epoch(t1)) AS DOUBLE)")} FROM s3""".stripMargin,
    "q122_cohort_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |  CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
        |sz AS (SELECT cohort_week, COUNT(DISTINCT user_id) AS cohort_size
        |       FROM c GROUP BY cohort_week),
        |a AS (SELECT c.cohort_week, ev.week - c.cohort_week AS week_offset,
        |      COUNT(DISTINCT ev.user_id) AS n_active
        |      FROM ev JOIN c ON ev.user_id = c.user_id GROUP BY 1, 2)
        |SELECT a.cohort_week, a.week_offset, a.n_active, sz.cohort_size,
        | CAST(FLOOR(a.n_active * 1000000 / sz.cohort_size) AS BIGINT) AS retention_ppm
        |FROM a JOIN sz USING (cohort_week)""".stripMargin,
    "q10_event_window_sum" ->
      s"""SELECT CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS window_start,
         | event_type, ${dsumSql("value")} AS sum_value, COUNT(*) AS n_events
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q11_event_conditional" ->
      """SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start,
        | COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        | COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase
        |FROM events GROUP BY 1""".stripMargin,
    "q12_event_json" ->
      """SELECT event_type,
        | CAST(SUM(CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(SUM(CAST(json_extract_string(props, 'k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q13_sessionize" ->
      """WITH g AS (
        | SELECT user_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
        |       THEN 1 ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
        | COUNT(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,
    "q14_event_top_users" ->
      s"""SELECT user_id, ${dsumSql("value")} AS total_value, COUNT(*) AS n_events
         |FROM events GROUP BY user_id
         |ORDER BY total_value DESC, user_id LIMIT 20""".stripMargin,
    "q37_session_windows" ->
      """WITH g AS (
        | SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800.0
        |       THEN 1 ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        | SELECT user_id, ts,
        |  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM g)
        |SELECT user_id,
        | CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
        | COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "q42_asof_join" ->
      """WITH od AS (
        | SELECT o_custkey AS key, CAST(floor(epoch(o_orderdate)/86400) AS BIGINT) AS d,
        |        MAX(o_orderkey) AS okey
        | FROM orders GROUP BY 1, 2),
        |ev AS (
        | SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |        CAST(floor(epoch(ts)/86400) AS BIGINT) AS d
        | FROM events WHERE user_id < 20)
        |SELECT e.user_id, e.ts_s, o.okey
        |FROM ev e ASOF LEFT JOIN od o ON e.user_id = o.key AND e.d >= o.d""".stripMargin,
    "q43_event_pivot" ->
      """SELECT user_id,
        | COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        | COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        | COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        | COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id""".stripMargin,
    "q50_range_join" ->
      """WITH ev AS (
        | SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        | FROM events),
        |a AS (SELECT user_id AS a_user, ts_s AS a_start
        |      FROM ev WHERE event_type = 'error')
        |SELECT a_user AS user_id, a_start AS anchor_s, COUNT(*) AS n_events
        |FROM a JOIN ev
        |  ON ev.user_id = a.a_user
        | AND ev.ts_s >= a.a_start AND ev.ts_s < a.a_start + 3600
        |GROUP BY 1, 2""".stripMargin,
    "q52_sliding_window" ->
      s"""WITH w AS (
         | SELECT event_type, value,
         |  unnest([CAST(floor(epoch(ts)/300)*300 AS BIGINT),
         |          CAST(floor(epoch(ts)/300)*300 - 300 AS BIGINT)]) AS window_start
         | FROM events WHERE ts IS NOT NULL)
         |SELECT window_start, event_type, COUNT(*) AS n_events,
         | ${dsumSql("value")} AS sum_value
         |FROM w GROUP BY 1, 2""".stripMargin,
    "q57_user_gaps" ->
      """WITH e AS (
        | SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        | FROM events WHERE user_id < 50),
        |g AS (
        | SELECT user_id,
        |  ts_s - LAG(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap
        | FROM e)
        |SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(gap) AS BIGINT) AS sum_gap_s,
        | MAX(gap) AS max_gap_s,
        | COUNT(CASE WHEN gap > 1800 THEN 1 END) AS n_breaks
        |FROM g GROUP BY user_id""".stripMargin,
    "q71_salted_agg" ->
      s"""SELECT event_type, ${dsumSql("value")} AS sum_value, COUNT(*) AS n
         |FROM events GROUP BY event_type""".stripMargin,
    // composed from the stage fragments proven by q49/q45/q41/q55/q46,
    "q73_collect_agg" ->
      """SELECT event_type,
        | COALESCE(array_to_string(
        |   (list_sort(list(DISTINCT user_id) FILTER (WHERE value > 99)))[1:3], ','),
        |  '') AS first_users,
        | COUNT(CASE WHEN value > 99 THEN 1 END) AS n_high
        |FROM events GROUP BY event_type""".stripMargin,
    "q76_unpivot" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |ty AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
        |c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2)
        |SELECT u.user_id, ty.event_type, COALESCE(c.n, 0) AS n
        |FROM u CROSS JOIN ty LEFT JOIN c USING (user_id, event_type)""".stripMargin,
    "q79_gap_fill" ->
      """WITH e AS (
        | SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d FROM events),
        |pd AS (SELECT d, COUNT(*) AS n_events FROM e GROUP BY d),
        |r AS (SELECT unnest(generate_series((SELECT MIN(d) FROM e),
        |                                    (SELECT MAX(d) FROM e))) AS d)
        |SELECT r.d, COALESCE(pd.n_events, 0) AS n_events
        |FROM r LEFT JOIN pd USING (d)""".stripMargin,
    "q138_event_anomalies" ->
      """WITH pd AS (
        | SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
        |  COUNT(*) AS n
        | FROM events GROUP BY event_type, d),
        |t AS (SELECT event_type, d, n,
        |  CAST(SUM(n) OVER w AS BIGINT) AS sum7,
        |  CAST(COUNT(n) OVER w AS BIGINT) AS cnt7
        | FROM pd WINDOW w AS (PARTITION BY event_type ORDER BY d
        |   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, d, n, sum7, cnt7
        |FROM t WHERE cnt7 > 0
        | AND (n * cnt7 - sum7) * (n * cnt7 - sum7) > 4 * sum7 * cnt7""".stripMargin,
    "q139_session_pairs" ->
      """WITH g AS (
        | SELECT user_id, event_type, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
        |       THEN 1 ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_type,
        |  SUM(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM g),
        |d AS (SELECT DISTINCT user_id, session_seq, event_type FROM s)
        |SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_sessions
        |FROM d a JOIN d b ON a.user_id = b.user_id
        |  AND a.session_seq = b.session_seq AND a.event_type < b.event_type
        |GROUP BY t1, t2
        |ORDER BY n_sessions DESC, t1, t2 LIMIT 20""".stripMargin,
  )
}
