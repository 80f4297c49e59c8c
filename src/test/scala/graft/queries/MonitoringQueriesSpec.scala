package graft.queries

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-behavior gates for the q137–q140 family: the clustering
  * coefficient on hand graphs, the Poisson-z anomaly gate on a planted
  * spike, session co-occurrence on hand-built sessions (including the
  * tied-timestamp determinism the tieBreak column exists for), and the
  * drift monitor on a planted half-corpus shift.
  */
class MonitoringQueriesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("q137 core: triangle = 1e6 ppm everywhere; star center = 0") {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), // triangle
      (10L, 11L), (10L, 12L), (10L, 13L))       // star centered at 10
      .toDF("u", "v")
    val c = QueryPack.clusteringFromGraph(und).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(c(1L) == ((2L, 1L, 1000000L)) && c(2L) == ((2L, 1L, 1000000L)))
    assert(c(10L) == ((3L, 0L, 0L)))
    assert(!c.contains(11L), "degree-1 leaves have no defined coefficient")
  }

  test("q138 core: a planted 3x spike fires; the stable series does not") {
    def day(d: Int) = new java.sql.Timestamp(d * 86400L * 1000L)
    // 'stable': 10 events every day for 10 days; 'spiky': same but day 9
    // has 30
    val rows = for {
      d <- 0 until 10
      t <- Seq("stable", "spiky")
      n = if (t == "spiky" && d == 9) 30 else 10
      i <- 0 until n
    } yield (d.toLong * 1000 + i, day(d), 1L, t, 0.0, "{}")
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = QueryPack.eventAnomaliesCore(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSet == Set(("spiky", 9L)))
  }

  test("q139 core: pairs count sessions, not event repetitions; gap splits") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      // user 1, session 1: view, click, click (dup type counts once)
      (1L, ts(1000), 1L, "view"), (2L, ts(1010), 1L, "click"),
      (3L, ts(1020), 1L, "click"),
      // user 1, session 2 (gap > 1800): view, purchase
      (4L, ts(4000), 1L, "view"), (5L, ts(4010), 1L, "purchase"),
      // user 2, one session: view, click
      (6L, ts(50), 2L, "view"), (7L, ts(60), 2L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val out = QueryPack.sessionPairsCore(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(("click", "view") -> 2L, ("purchase", "view") -> 1L))
  }

  test("q139 core: tied timestamps at a session boundary are deterministic") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val base = Seq(
      (1L, ts(0), 1L, "view"),
      // two events share the boundary instant 2000 (gap 2000 > 1800)
      (2L, ts(2000), 1L, "click"), (3L, ts(2000), 1L, "purchase"))
    def run(rows: Seq[(Long, java.sql.Timestamp, Long, String)]) =
      QueryPack.sessionPairsCore(rows
          .toDF("event_id", "ts", "user_id", "event_type")
          .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
          .repartition(3))
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSet
    val a = run(base)
    val b = run(base.reverse)
    assert(a == b)
    // both tied rows land in the SAME (new) session: click+purchase pair
    assert(a == Set((("click", "purchase"): (String, String), 1L)).map {
      case ((x, y), n) => ((x, y), n) })
  }

  test("q140 shape: a planted shift scores lower drift than replicated halves") {
    val dim = 8
    val rng = new scala.util.Random(5)
    // label from i/2 so each label holds BOTH vec_id parities (halves);
    // label 1's odd half is shifted along dim 0 — the planted drift
    val rows = (0L until 200L).map { i =>
      val label = ((i / 2) % 2).toInt
      val base = (0 until dim).map(_ => rng.nextDouble())
      val v = base.zipWithIndex.map { case (x, j) =>
        (x + (if (label == 1 && i % 2 == 1 && j == 0) 5.0 else 0.0)).toFloat
      }
      (i, v, label)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val dims = 1 to dim
    import graft.functions.ExactNum.favg
    val cents = df.withColumn("half", (col("vec_id") % 2).cast("int"))
      .groupBy(col("label"), col("half"))
      .agg(count(lit(1)).as("n"),
        dims.map(i => favg(element_at(col("embedding"), i)).as(s"c$i")): _*)
      .select(col("label") +: col("half") +: col("n") +:
        Seq(array(dims.map(i => col(s"c$i")): _*).as("c")): _*)
    val a = cents.filter(col("half") === 0)
      .select(col("label"), col("c").as("ca"))
    val b = cents.filter(col("half") === 1)
      .select(col("label"), col("c").as("cb"))
    val drift = a.join(b, Seq("label"))
      .withColumn("ppm", floor(
        graft.functions.VectorFunctions.cosine(col("ca"), col("cb")) * 1000000.0)
        .cast("long"))
      .select(col("label"), col("ppm"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(drift(1) < drift(0), s"shifted label must drift more: $drift")
    assert(drift(0) > 990000L, "unshifted halves stay near cosine 1")
  }
}
