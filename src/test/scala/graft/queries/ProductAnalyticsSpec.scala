package graft.queries

import java.sql.Timestamp

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture gates for the product-analytics pair (q121/q122):
  * the funnel must enforce STRICT step ordering (a click before the
  * first view must not count — the property that separates a funnel
  * from three filters), and cohort retention must bucket users by
  * first-activity week with exact ppm arithmetic.
  */
class ProductAnalyticsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def ts(minutes: Long) = new Timestamp(minutes * 60000L)

  private def eventsDf(rows: Seq[(Long, Timestamp, String)]) =
    rows.toDF("user_id", "ts", "event_type")

  test("funnel: strict ordering — pre-view clicks and pre-click purchases don't count") {
    val rows = Seq(
      // user 1: full ordered funnel
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: click BEFORE the first view — stops at step 1
      (2L, ts(20), "click"), (2L, ts(30), "view"),
      // user 3: purchase BEFORE the click — reaches step 2 only
      (3L, ts(10), "view"), (3L, ts(15), "purchase"), (3L, ts(25), "click"),
      // user 4: never views — in no step (their click can't anchor)
      (4L, ts(5), "click"), (4L, ts(6), "purchase"))
    val got = QueryPack.funnelSteps(eventsDf(rows), Seq("view", "click", "purchase"))
      .select("step_idx", "n_users", "avg_secs_from_start")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // step1: users 1,2,3; step2: users 1 (click@20) and 3 (click@25);
    // step3: user 1 only (purchase@30)
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    // times from funnel start: step2 = mean(600, 900) = 750; step3 = 1200
    assert(got(1)._3 == 750.0 && got(2)._3 == 1200.0)
  }

  test("funnel: equal timestamps do NOT advance a step (strictly-after contract)") {
    val rows = Seq((1L, ts(10), "view"), (1L, ts(10), "click"))
    val got = QueryPack.funnelSteps(eventsDf(rows), Seq("view", "click"))
      .select("step_idx", "n_users").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L), (2L, 0L)))
  }

  test("funnel: later same-type events can satisfy a step the first occurrence couldn't") {
    // user's first click precedes the view, the second follows it
    val rows = Seq((1L, ts(5), "click"), (1L, ts(10), "view"), (1L, ts(15), "click"))
    val got = QueryPack.funnelSteps(eventsDf(rows), Seq("view", "click"))
      .select("step_idx", "n_users").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L)))
  }

  test("cohort retention: first-activity week buckets users; ppm exact") {
    val week = 604800L // seconds
    def at(weeks: Long, offsetMin: Long) = new Timestamp((weeks * week + offsetMin * 60) * 1000L)
    val rows = Seq(
      // cohort week 0: users 1,2 — user 1 active weeks 0,1,2; user 2 weeks 0,2
      (1L, at(0, 5), "e"), (1L, at(1, 9), "e"), (1L, at(2, 1), "e"),
      (2L, at(0, 30), "e"), (2L, at(2, 40), "e"),
      // cohort week 1: user 3 — active weeks 1,3
      (3L, at(1, 0), "e"), (3L, at(3, 2), "e"),
      // duplicate activity inside one week must not double-count
      (2L, at(0, 31), "e"))
    val got = QueryPack.cohortRetentionEvents(eventsDf(rows))
      .select("cohort_week", "week_offset", "n_active", "cohort_size", "retention_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 2L, 1000000L),
      (0L, 1L, 1L, 2L, 500000L),
      (0L, 2L, 2L, 2L, 1000000L),
      (1L, 0L, 1L, 1L, 1000000L),
      (1L, 2L, 1L, 1L, 1000000L)))
  }

  test("cohort retention: partitioning-invariant") {
    val rows = (1L to 200L).map { i =>
      (i % 40, new Timestamp((i * 86400L + i) * 1000L), "e")
    }
    val df = eventsDf(rows)
    val a = QueryPack.cohortRetentionEvents(df).collect().map(_.toString).sorted.toSeq
    val b = QueryPack.cohortRetentionEvents(df.repartition(17)).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
