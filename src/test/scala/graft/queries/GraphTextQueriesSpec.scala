package graft.queries

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture gates for round-13's graph/text additions: the
  * skyline (q115) must equal brute-force Pareto dominance, the SymSpell
  * join (q116) must find EVERY pair within its edit-distance bound (the
  * deletion-neighborhood completeness claim), the trigram LM (q117)
  * must walk the stupid-backoff chain level by level with the exact
  * half-bit penalties, PageRank (q118) must reproduce hand-computed
  * integer mass flow, and the inverted index (q119) must bound posting
  * lists before collection.
  */
class GraphTextQueriesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // ------------------------------------------------------------ skyline
  private def bruteSkyline(pts: Seq[(String, Long, Long, Double)]) =
    pts.filter { case (g, _, x, y) =>
      !pts.exists { case (g2, _, x2, y2) =>
        g2 == g && ((x2 > x && y2 >= y) || (x2 >= x && y2 > y))
      }
    }.map(p => (p._1, p._2)).toSet

  test("skyline: equals brute-force strict Pareto dominance") {
    // deterministic scatter incl. duplicated points and axis ties
    val pts = (1L to 60L).map { i =>
      val g = if (i % 2 == 0) "en" else "de"
      (g, i, (i * 37 % 23) + 1, ((i * 53 % 17) + 1).toDouble)
    } ++ Seq(("en", 100L, 24L, 1.0), ("en", 101L, 24L, 1.0)) // dup point
    val df = pts.toDF("lang", "doc_id", "n_chars", "quality")
    val got = QueryPack.skyline2d(df, "lang", "n_chars", "quality")
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(got == bruteSkyline(pts))
  }

  test("skyline: duplicated extreme points both survive; dominated never") {
    val pts = Seq(("en", 1L, 10L, 5.0), ("en", 2L, 10L, 5.0), // tied corner
      ("en", 3L, 10L, 4.0), // dominated on y at same x
      ("en", 4L, 5L, 9.0), // other corner
      ("en", 5L, 4L, 9.0)) // dominated on x at same y
    val df = pts.toDF("lang", "doc_id", "n_chars", "quality")
    val got = QueryPack.skyline2d(df, "lang", "n_chars", "quality")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("skyline: partitioning-invariant") {
    val pts = (1L to 80L).map(i => ("en", i, i * 31 % 29, (i * 41 % 19).toDouble))
    val df = pts.toDF("lang", "doc_id", "n_chars", "quality")
    val a = QueryPack.skyline2d(df, "lang", "n_chars", "quality")
      .select("doc_id").as[Long].collect().toSet
    val b = QueryPack.skyline2d(df.repartition(13), "lang", "n_chars", "quality")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  // -------------------------------------------------------- spell pairs
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("spell pairs: finds EVERY pair within distance 2 (neighborhood completeness)") {
    val words = Seq("hello", "helo", "hallo", "help", "world", "wrold",
      "word", "spark", "spork", "stark", "query", "quart")
    val vocab = words.zipWithIndex.map { case (w, i) => (w, 10L + i) }
      .toDF("w", "c")
    val got = QueryPack.spellPairsVocab(vocab, maxDist = 2)
      .select("w1", "w2", "dist").as[(String, String, Long)].collect().toSet
    val want = (for {
      a <- words; b <- words if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got == want, s"missing: ${want -- got}; extra: ${got -- want}")
    assert(want.nonEmpty && want.size >= 8) // the fixture is non-vacuous
  }

  test("spell pairs: maxDist = 1 keeps only distance-1 pairs, counts ride along") {
    val vocab = Seq(("hello", 100L), ("helo", 3L), ("hallo", 7L), ("xyzzy", 9L))
      .toDF("w", "c")
    val got = QueryPack.spellPairsVocab(vocab, maxDist = 1)
      .select("w1", "w2", "c1", "c2", "dist")
      .as[(String, String, Long, Long, Long)].collect().toSet
    // hello–helo d1, hallo–hello d1, hallo–helo d2 (excluded)
    assert(got == Set(("hello", "helo", 100L, 3L, 1L),
      ("hallo", "hello", 7L, 100L, 1L)))
  }

  test("spell pairs: emits no duplicate pair rows and rejects maxDist > 2") {
    // many shared variants between the pair must still yield ONE row
    val vocab = Seq(("aaaa", 5L), ("aaab", 5L)).toDF("w", "c")
    val rows = QueryPack.spellPairsVocab(vocab, maxDist = 2).collect()
    assert(rows.length == 1)
    intercept[IllegalArgumentException] {
      QueryPack.spellPairsVocab(vocab, maxDist = 3)
    }
  }

  // -------------------------------------------------------- trigram LM
  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, lang, text) => (id, lang, text) }
      .toDF("doc_id", "lang", "text")

  test("trigram LM: hand-walked backoff levels and half-bit arithmetic") {
    // train: "x y z" ×3 and "y z w" ×1 → V = 4, n_total = 12
    val train = docsDf(Seq((1L, "en", "x y z"), (2L, "en", "x y z"),
      (3L, "en", "x y z"), (4L, "en", "y z w")))
    // test doc A: "x y z"   → trigram seen (level 3):
    //   q = (c(x y) + V) div (c(x y z) + 1) = (3 + 4) div 4 = 1 → hb = bitlen(1) − 1 = 0
    // test doc B: "q y z"   → trigram unseen, suffix "y z" seen (level 2):
    //   q = (c(y) + V) div (c(y z) + 1) = (4 + 4) div 5 = 1 → hb = 0 + 4
    // test doc C: "q q q"   → fully unseen (level 1):
    //   q = (n_total + V) div (c(q) + 1) = 16 div 1 = 16 → hb = bitlen(256) − 1 = 8, + 8 = 16
    val test_ = docsDf(Seq((10L, "a3", "x y z"), (11L, "a2", "q y z"),
      (12L, "a1", "q q q")))
    val got = QueryPack.trigramSurprisalSplit(train, test_, flagThreshold = 5.0)
      .select("lang", "avg_surprisal", "n_tri_hits", "n_bi_hits", "n_uni_hits")
      .as[(String, Double, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a3") == (("a3", 0.0, 1L, 0L, 0L)))
    assert(got("a2") == (("a2", 2.0, 0L, 1L, 0L)))
    assert(got("a1") == (("a1", 8.0, 0L, 0L, 1L)))
  }

  test("trigram LM: docs with <3 tokens score 0 and count as docs") {
    val train = docsDf(Seq((1L, "en", "x y z")))
    val test_ = docsDf(Seq((10L, "en", "x y"), (11L, "en", "")))
    val got = QueryPack.trigramSurprisalSplit(train, test_, flagThreshold = 5.0)
      .select("n_docs", "avg_surprisal", "n_tri_hits")
      .as[(Long, Double, Long)].collect()
    assert(got.toSeq == Seq((2L, 0.0, 0L)))
  }

  // ---------------------------------------------------------- pagerank
  test("pagerank: hand-computed integer mass flow on a 3-node star") {
    // edges: 1→0, 2→0, 0→1  (node 0 is the hub)
    val docs = Seq(0L, 1L, 2L).toDF("doc_id")
    val nRow = docs.agg(count(lit(1)).as("n"))
    val edges = Seq((1L, 0L), (2L, 0L), (0L, 1L)).toDF("src", "dst")
    // base = 10^12 div 3 = 333333333333; teleport = 15·base div 100 = 49999999999
    // iter 1: inflow(0) = 2·base, inflow(1) = base, inflow(2) = 0
    //   r(0) = tp + 85·2·base div 100 = 49999999999 + 566666666666 = 616666666665
    //   r(1) = tp + 85·base div 100  = 49999999999 + 283333333333 = 333333333332
    //   r(2) = tp = 49999999999
    val got = QueryPack.pagerankRanks(docs, nRow, edges, iters = 1)
      .orderBy(col("id")).select("rank").as[Long].collect().toSeq
    assert(got == Seq(616666666665L, 333333333332L, 49999999999L))
  }

  test("pagerank: a hub outranks leaves after 3 iterations; partition-invariant") {
    val docs = (0L to 49L).toDF("doc_id")
    val nRow = docs.agg(count(lit(1)).as("n"))
    // every node links to node 0 and its successor ring
    val edges = (1L to 49L).map(i => (i, 0L)) ++ (0L to 49L).map(i => (i, (i + 1) % 50))
    val e = edges.toDF("src", "dst").filter(col("src") =!= col("dst"))
    val r = QueryPack.pagerankRanks(docs, nRow, e, iters = 3)
      .orderBy(col("rank").desc, col("id")).select("id").as[Long].collect()
    assert(r.head == 0L, "the universally-linked hub must rank first")
    val r2 = QueryPack.pagerankRanks(docs.repartition(7), nRow, e.repartition(5), iters = 3)
      .orderBy(col("rank").desc, col("id")).select("id").as[Long].collect()
    assert(r.toSeq == r2.toSeq, "ranks must not depend on partitioning")
  }

  // ------------------------------------------------------ inverted index
  test("inverted index: exact df/cf, postings bounded to first k ascending") {
    val docs = ((1L to 12L).map(i => (i, "en", "common word")) ++
      Seq((20L, "en", "rare rare"), (21L, "en", "rare")))
      .map { case (id, lang, text) => (id, lang, text, text.length.toLong) }
      .toDF("doc_id", "lang", "text", "n_chars")
    val got = QueryPack.invertedIndexDocs(docs, minDf = 2, k = 8)
      .select("term", "df", "cf", "head_postings")
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got("common") == (("common", 12L, 12L, "1,2,3,4,5,6,7,8")))
    assert(got("word") == (("word", 12L, 12L, "1,2,3,4,5,6,7,8")))
    assert(got("rare") == (("rare", 2L, 3L, "20,21"))) // cf counts tf=2 in doc 20
    // below-minDf terms are absent under a higher threshold
    val filtered = QueryPack.invertedIndexDocs(docs, minDf = 5, k = 8)
      .select("term").as[String].collect().toSet
    assert(filtered == Set("common", "word"))
  }
}
