package graft.queries

import graft.SparkTest
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior specs for the round-11 quality/retrieval additions:
  * unigram-LM surprisal (q90), BM25 ranking (q91), duplicated-span
  * detection (q92), and JL random projection (q93). The DuckDB oracles
  * pin the full numeric outputs; these specs pin the SEMANTICS on
  * hand-walked and planted inputs, plus the hash-path ≡ string-path
  * equivalence q92's oracle relies on.
  */
class QualityRetrievalSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  test("unigram surprisal: hand-walked half-bit values, empty doc scores 0") {
    import spark.implicits._
    // corpus: c(a)=6, c(rare)=1, N=7, V=2 → N+V=9
    //   q(a)    = 9 div 7 = 1 → 1²  → bitlen 1 → 0 half-bits
    //   q(rare) = 9 div 2 = 4 → 16 → bitlen 5 → 4 half-bits
    val docs = Seq(
      (1L, "a a a a a", "en"), // 5·0 / (2·5)        = 0.0
      (2L, "a rare", "en"),    // (0+4) / (2·2)      = 1.0
      (3L, "", "en")           // no tokens           = 0.0
    ).toDF("doc_id", "text", "lang")
    val got = QueryPack.unigramSurprisalPerDoc(docs)
      .select(col("doc_id"), col("surprisal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 0.0, 2L -> 1.0, 3L -> 0.0))
  }

  test("unigram surprisal: rarer tokens strictly raise a document's score") {
    import spark.implicits._
    // common×18 vs two docs: all-common scores below half-rare
    val docs = (Seq((1L, "common rare", "en"), (2L, "common common", "en")) ++
      (3L to 10L).map(i => (i, "common common", "en"))).toDF("doc_id", "text", "lang")
    val got = QueryPack.unigramSurprisalPerDoc(docs)
      .select(col("doc_id"), col("surprisal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L),
      s"doc with the rare token must score higher: ${got(1L)} vs ${got(2L)}")
  }

  test("bigram surprisal: hand-walked half-bit values; <2-token docs score 0") {
    import spark.implicits._
    // bigram counts: c("x y")=2, c("y x")=2, c("x z")=1; contexts:
    // c(x)=3, c(y)=2; V=3 (distinct unigrams x,y,z)
    //   q("x y") = (3+3) div 3 = 2 → 4  → bitlen 3 → 2 hb → 1.0 bits
    //   q("y x") = (2+3) div 3 = 1 → 1  → bitlen 1 → 0 hb → 0.0 bits
    //   q("x z") = (3+3) div 2 = 3 → 9  → bitlen 4 → 3 hb → 1.5 bits
    val docs = Seq(
      (1L, "x y x y x", "en"), // (2+0+2+0)/(4·2) = 0.5
      (2L, "x z", "en"),       // 3/(1·2)          = 1.5
      (3L, "x", "en"),         // single token → no bigram → 0.0
      (4L, "", "en")           // empty → 0.0
    ).toDF("doc_id", "text", "lang")
    val got = QueryPack.bigramSurprisalPerDoc(docs)
      .select(col("doc_id"), col("surprisal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 0.5, 2L -> 1.5, 3L -> 0.0, 4L -> 0.0))
  }

  test("bigram surprisal separates scrambled text the unigram gate cannot") {
    import spark.implicits._
    // every doc has the same unigram profile (each token once), so the
    // unigram model scores them identically — but the scrambled doc's
    // bigrams are corpus singletons while the fluent phrasing repeats
    val docs = ((1L to 5L).map(i => (i, "the quick brown fox", "en")) :+
      (6L, "quick the fox brown", "en")).toDF("doc_id", "text", "lang")
    val uni = QueryPack.unigramSurprisalPerDoc(docs)
      .select(col("doc_id"), col("surprisal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(6L) === uni(1L), "unigram surprisal is permutation-invariant")
    val bi = QueryPack.bigramSurprisalPerDoc(docs)
      .select(col("doc_id"), col("surprisal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi(6L) > bi(1L),
      s"scrambled doc must out-surprise fluent ones: ${bi(6L)} vs ${bi(1L)}")
  }

  test("BM25: higher tf in a shorter doc ranks first; term-free docs never rank") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark spark", "en"),
      (2L, "spark alpha beta gamma", "en"),
      (3L, "alpha beta gamma delta", "en")
    ).toDF("doc_id", "text", "lang")
    val terms = Seq((1L, "spark")).toDF("query_id", "t")
    val rows = QueryPack.bm25Rank(docs, terms)
      .orderBy(col("rank")).collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 2L), // doc 3 absent
      s"expected docs 1,2 ranked; got ${rows.mkString(", ")}")
    assert(rows.forall(_.getDouble(2) > 0.0), "BM25+ scores must be positive")
    assert(rows.head.getDouble(2) > rows(1).getDouble(2),
      "tf=4 in dl=4 must outscore tf=1 in dl=4")
  }

  test("BM25: length normalization — same tf scores lower in a longer document") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark alpha", "en"),
      (2L, "spark alpha beta gamma delta epsilon zeta eta", "en")
    ).toDF("doc_id", "text", "lang")
    val terms = Seq((1L, "spark")).toDF("query_id", "t")
    val byDoc = QueryPack.bm25Rank(docs, terms)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(byDoc(1L) > byDoc(2L),
      s"shorter doc must score higher at equal tf: $byDoc")
  }

  test("dup spans: identical planted docs share every window; unique doc shares none") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z w v", "s0"),
      (2L, "x y z w v", "s0"),
      (3L, "p q r s t u", "s1")
    ).toDF("doc_id", "text", "source")
    val got = QueryPack.spanDupFractions(docs, 3)
      .select(col("doc_id"), col("dup_frac"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 1.0 && got(2L) === 1.0, s"identical docs must be fully shared: $got")
    assert(got(3L) === 0.0, s"unique doc must share nothing: $got")
  }

  test("dup spans: partial overlap — shared prefix window only") {
    import spark.implicits._
    // docs share exactly the window "a b c"; doc 1 has 2 windows, doc 2 has 3
    val docs = Seq(
      (1L, "a b c d", "s0"),   // windows: "a b c", "b c d"   → 1/2 shared
      (2L, "a b c x y", "s0")  // windows: "a b c", "b c x", "c x y" → 1/3
    ).toDF("doc_id", "text", "source")
    val got = QueryPack.spanDupFractions(docs, 3)
      .select(col("doc_id"), col("dup_frac"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.5 && got(2L) === 0.333333, s"expected 1/2 and 1/3 floored: $got")
  }

  test("dup spans: native hash path ≡ string-window path on the real corpus") {
    // q92's oracle replays windows as STRINGS while the engine shuffles
    // 64-bit shingle hashes; this pins that the two give identical
    // per-document window counts on the full test corpus (hash
    // collisions would break the oracle's premise).
    val docs = graft.Tables.documents(spark, dir)
    val viaHash = QueryPack.spanDupFractions(docs, 15)
      .select(col("doc_id"), col("dup_frac"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wins = docs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.shingles(col("text"), 15))).as("h"))
    val perDoc = wins
      .withColumn("n_with", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"),
           count(when(col("n_with") >= 2, 1)).as("ns"))
    val viaString = docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("dup_frac", when(col("nw").isNull, lit(0.0))
        .otherwise(floor(col("ns").cast("double") / col("nw") * 1e6) / 1e6))
      .select(col("doc_id"), col("dup_frac"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaHash === viaString)
  }

  test("dup span extents: shared prefix and suffix merge into two separate islands") {
    import spark.implicits._
    // w=3: docs share tokens 0-4 and 8-12; the middles differ, so the
    // shared window positions {0,1,2} and {8,9,10} merge into exactly
    // two token ranges per doc: [0,4] and [8,12], 3 windows each
    val docs = Seq(
      (1L, "a b c d e u1 u2 u3 p q r s t", "en"),
      (2L, "a b c d e v1 v2 v3 p q r s t", "en"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w0", "en")
    ).toDF("doc_id", "text", "lang")
    val got = QueryPack.spanExtents(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      (1L, 0L, 4L, 3L), (1L, 8L, 12L, 3L),
      (2L, 0L, 4L, 3L), (2L, 8L, 12L, 3L)))
  }

  test("dup span extents and dup-span fractions agree on WHICH documents share spans") {
    val docs = graft.Tables.documents(spark, dir)
    val withExtents = QueryPack.spanExtents(docs, 15)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val withShared = QueryPack.spanDupFractions(docs, 15)
      .filter(col("dup_frac") > 0.0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(withExtents === withShared)
  }

  test("span scrub: cuts exactly the planted extents and rebuilds the kept text") {
    import spark.implicits._
    // same two-island geometry as the extents spec (w=3): docs 1/2 share
    // tokens 0-4 and 8-12, middles are unique → scrub keeps the middle
    val docs = Seq(
      (1L, "a b c d e u1 u2 u3 p q r s t", "en"),
      (2L, "a b c d e v1 v2 v3 p q r s t", "en"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w0", "en")
    ).toDF("doc_id", "text", "lang")
    val got = QueryPack.scrubSpans(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got === Set(
      (1L, 13L, 10L, m("u1 u2 u3")),
      (2L, 13L, 10L, m("v1 v2 v3"))), s"unexpected scrub output: $got")
  }

  test("span scrub: removal counts match an explode-and-range-join recount on the real corpus") {
    // the scrub derives n_removed from extent lengths and cuts with a
    // map-side positional filter; this recounts covered TOKENS the
    // heavyweight way (posexplode + range join) — divergence would mean
    // an extent escaping the document's token range or overlapping
    // another
    val docs = graft.Tables.documents(spark, dir)
    val ext = QueryPack.spanExtents(docs, 15)
      .withColumnRenamed("doc_id", "ext_doc_id")
    val recount = docs
      .select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
      .join(ext, col("doc_id") === col("ext_doc_id") &&
        col("pos").cast("long").between(col("span_start"), col("span_end")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromScrub = QueryPack.scrubSpans(docs, 15)
      .select(col("doc_id"), col("n_removed"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromScrub === recount,
      "scrub must remove exactly the tokens the extents cover")
  }

  test("alpha sampling: thresholds match a sequential recompute; low-resource lang is up-weighted") {
    import spark.implicits._
    // 90 hi-resource docs vs 10 lo-resource: α=0.5 gives lo an
    // acceptance rate of min(1, 50·√10/S/10) = 1.25 → capped at 1 —
    // every lo doc survives — while hi keeps ~42%
    val docs = ((1L to 90L).map(i => (i, s"hi doc $i", "hi")) ++
      (91L to 100L).map(i => (i, s"lo doc $i", "lo"))).toDF("doc_id", "text", "lang")
    val got = QueryPack.alphaSampleStats(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // mirror the engine's fold order exactly: langs ascending
    val s = 0.0 + math.sqrt(90.0) + math.sqrt(10.0)
    def thr(n: Long): Long =
      math.floor(math.min(1.0, 50.0 * math.sqrt(n.toDouble) / s / n.toDouble) * 1e6).toLong
    assert(got("hi")._1 === 90L && got("lo")._1 === 10L)
    assert(got("hi")._3 === thr(90) && got("lo")._3 === thr(10),
      s"thresholds drifted from the sequential recompute: $got")
    assert(got("lo")._3 === 1000000L && got("lo")._2 === 10L,
      "capped low-resource language must keep every document")
    assert(got("lo")._2.toDouble / 10 > got("hi")._2.toDouble / 90,
      s"α-sampling must up-weight the low-resource language: $got")
  }

  test("C4 filter: each rule trips on exactly its planted violator") {
    import spark.implicits._
    // one clean doc + one violator per rule; filler words are 4-5 chars
    // so mean word length stays inside [3,5] except for the planted
    // long-word doc (which also trips the repetition rule — dup ×28)
    val docs = Seq(
      (1L, "the of " + (1 to 28).map(i => s"wrd$i").mkString(" "), "en"), // passes all
      (2L, "the of " + (1 to 10).map(i => s"wrd$i").mkString(" "), "en"), // <25 toks
      (3L, "the of " + Seq.fill(28)("dupl").mkString(" "), "en"), // dup_ratio 0.9 > 0.6
      (4L, (1 to 30).map(i => s"wrd$i").mkString(" "), "en"),     // no stopwords
      (5L, "the of " + Seq.fill(28)("hippopotamus").mkString(" "), "en"), // mean_wl 11.4 (also dup)
      (6L, "the of " + (1 to 28).map(i => s"w$i.,").mkString(" "), "en")  // punct 0.34
    ).toDF("doc_id", "text", "lang")
    val r = QueryPack.c4FilterStats(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 6L)
    assert(r.getAs[Long]("n_kept") === 1L, s"only the clean doc passes: $r")
    assert(r.getAs[Long]("n_fail_len") === 1L, s"$r")
    assert(r.getAs[Long]("n_fail_rep") === 2L, s"$r")     // docs 3 and 5
    assert(r.getAs[Long]("n_fail_stop") === 1L, s"$r")
    assert(r.getAs[Long]("n_fail_wordlen") === 1L, s"$r") // doc 5
    assert(r.getAs[Long]("n_fail_punct") === 1L, s"$r")
  }

  test("C4 filter: empty document fails the length rule with zeroed ratios") {
    import spark.implicits._
    val docs = Seq((1L, "", "en")).toDF("doc_id", "text", "lang")
    val r = QueryPack.c4FilterStats(docs).collect().head
    assert(r.getAs[Long]("n_kept") === 0L && r.getAs[Long]("n_fail_len") === 1L &&
      r.getAs[Long]("n_fail_rep") === 0L && r.getAs[Long]("n_fail_punct") === 0L)
  }

  test("PII redaction: planted email/url/long-word all rewrite; md5 matches the expected text") {
    import spark.implicits._
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val docs = Seq(
      (1L, "mail bob.smith@example.com or see https://example.com/a_b and telemetry data", "en"),
      (2L, "short toks only here", "en") // nothing 8+ letters, no PII → absent
    ).toDF("doc_id", "text", "lang")
    val got = QueryPack.piiRedactDocs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length === 1)
    // email first, then url, then the 8+-letter "telemetry"
    assert(got.head === ((1L, 3L, m("mail <EMAIL> or see <URL> and <LW> data"))))
  }

  test("JL projection: engine projection matches a sequential Scala recompute") {
    import org.apache.spark.sql.graft.VectorHashOps
    val row = QueryPack.jlProjection(spark, dir)
      .orderBy(col("vec_id")).limit(1).collect().head
    val emb = graft.Tables.embeddings(spark, dir)
      .orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).collect().head.getSeq[Float](0)
    var acc = 0.0
    emb.indices.foreach(d => acc += emb(d).toDouble * VectorHashOps.weight(d, 0))
    assert(row.getAs[Long]("p0_fp") === math.floor(acc * 1e6).toLong,
      s"p0 mismatch: engine ${row.getAs[Long]("p0_fp")} vs recompute $acc")
  }

  test("JL projection: norm-distortion ratio concentrates around 1 (unbiased estimate)") {
    val ratios = QueryPack.jlProjection(spark, dir)
      .select(col("ratio_fp")).collect().map(_.getLong(0))
    assert(ratios.nonEmpty)
    // k=16 → sd ≈ 0.35 per vector; the shared projection matrix shifts
    // the corpus mean by its own concentration (~±0.09). Deterministic
    // data: measured mean 1.010e6, range [0.227e6, 2.436e6].
    assert(ratios.forall(r => r > 50000L && r < 4000000L),
      s"individual distortion out of range: ${ratios.min}..${ratios.max}")
    val mean = ratios.sum.toDouble / ratios.length
    assert(mean > 800000 && mean < 1200000, s"mean distortion $mean drifted from 1e6")
  }

  test("JL projection is deterministic across runs") {
    val a = QueryPack.jlProjection(spark, dir).orderBy(col("vec_id")).collect()
    val b = QueryPack.jlProjection(spark, dir).orderBy(col("vec_id")).collect()
    assert(a.sameElements(b))
  }
}
