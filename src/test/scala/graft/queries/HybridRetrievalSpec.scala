package graft.queries

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-relevance gate for the COMPOSED retrieval pipeline (q107:
  * ANN shortlist → BM25 re-rank) — q91 gates the lexical leg and
  * q23/IvfPqSpec the embedding leg, but a RAG pipeline runs them
  * composed, and the composition has its own failure modes (shortlist
  * too small, fusion ordering wrong). The plant makes each leg fail
  * ALONE — a keyword-stuffed but semantically-far spam doc tops pure
  * BM25; an embedding-identical but term-free distractor tops pure
  * ANN — and requires the hybrid to put the planted relevant doc
  * first for every query (recall floor 1.0 on the deterministic
  * plant).
  */
class HybridRetrievalSpec extends AnyFunSuite with SparkTest {

  private val terms = Seq((1L, "spark"), (1L, "stream"),
    (2L, "vector"), (2L, "hash"), (3L, "window"), (3L, "scan"))
  private val termText = Map(1L -> "spark stream", 2L -> "vector hash",
    3L -> "window scan")

  // dim-4 plant per query i (basis direction v_i):
  //   D_i — distractor: embedding == query's (cosine 1.0), no terms
  //   R_i — relevant:   cosine ~0.994, text carries the query's terms
  //   N_i — neutral:    cosine 0.5, no terms (pads the shortlist)
  //   F_i — spam:       cosine 0 (w direction), terms repeated 5x —
  //                     tops PURE BM25 (higher tf) but never enters the
  //                     semantic shortlist
  private def basis(i: Int): Array[Double] = {
    val v = Array(0.0, 0.0, 0.0, 0.0); v(i) = 1.0; v
  }
  private lazy val (corpus, queryVecs, queryTerms) = {
    import spark.implicits._
    val w = Array(0.0, 0.0, 0.0, 1.0)
    def mix(a: Array[Double], fa: Double, b: Array[Double], fb: Double) = {
      val m = a.zip(b).map { case (x, y) => fa * x + fb * y }
      val n = math.sqrt(m.map(x => x * x).sum); m.map(_ / n).toSeq
    }
    val rows = (0 until 3).flatMap { i =>
      val q = (i + 1).toLong
      val v = basis(i)
      Seq(
        (q * 10 + 1, "filler filler filler", mix(v, 1.0, w, 0.0)),        // D
        (q * 10 + 2, s"${termText(q)} padding padding", mix(v, 0.9, w, 0.1)), // R
        (q * 10 + 3, "neutral neutral neutral", mix(v, 0.5, w, 0.866)),   // N
        (q * 10 + 4, Seq.fill(5)(termText(q)).mkString(" "), w.toSeq)     // F
      )
    }
    val corpus = rows.toDF("doc_id", "text", "embedding")
    val qv = (0 until 3).map(i => ((i + 1).toLong, basis(i).toSeq))
      .toDF("query_id", "embedding")
    val qt = terms.toDF("query_id", "t")
    (corpus, qv, qt)
  }

  test("each leg fails alone; the hybrid ranks the planted relevant doc first for every query") {
    // pure BM25 over the corpus: the keyword-stuffed spam doc wins
    // (tf=5 per term vs R's tf=1)
    val bm25Top = QueryPack.bm25Rank(
        corpus.select(col("doc_id"), col("text")), queryTerms)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 3L).foreach { q =>
      assert(bm25Top(q) == q * 10 + 4,
        s"plant broken: pure BM25 should surface the spam doc for query $q")
    }
    // pure ANN: the term-free distractor wins (cosine 1.0 > 0.994)
    val annTop = graft.operators.Similarity.bruteForceTopK(queryVecs,
        corpus.select(col("doc_id").as("vec_id"), col("embedding")), 3)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 3L).foreach { q =>
      assert(annTop(q) == q * 10 + 1,
        s"plant broken: pure ANN should surface the distractor for query $q")
    }
    // the hybrid: shortlist of 3 admits {D, R, N} (spam's cosine 0
    // loses to every same-query doc), BM25 re-rank lifts R to #1 —
    // brute leg here (the exact q107 twin); the ANN leg has its own
    // planted gate below over a corpus big enough to route
    val hybrid = QueryPack.hybridTopK(queryVecs, queryTerms, corpus,
      k = 3, shortlistSize = 3,
      shortlist = graft.operators.Similarity.bruteForceTopK).collect()
    val top1 = hybrid.filter(_.getInt(2) == 1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = (1L to 3L).count(q => top1.get(q).contains(q * 10 + 2)) / 3.0
    info(f"planted relevant@1 recall: $recall%.2f")
    assert(recall >= 1.0,
      s"hybrid must rank every planted relevant doc first, got $top1")
    // spam never leaks through the semantic gate
    assert(!hybrid.exists(_.getLong(1) % 10 == 4),
      "keyword-stuffed doc outside the shortlist must never appear")
    // term-free docs keep ANN order below the relevant doc: D (cos 1.0)
    // at rank 2, N (cos 0.5) at rank 3
    (1L to 3L).foreach { q =>
      val ranks = hybrid.filter(_.getLong(0) == q)
        .map(r => r.getInt(2) -> r.getLong(1)).toMap
      assert(ranks(2) == q * 10 + 1 && ranks(3) == q * 10 + 3,
        s"zero-score docs must keep cosine order for query $q: $ranks")
    }
  }

  test("ANN (IVF-PQ) shortlist leg: planted relevant doc survives the probe stage") {
    import spark.implicits._
    // same planted geometry, padded to 200 docs so the IVF index has
    // real cells to route through (the 12-doc plant alone would make
    // every probe exhaustive); pads are orthogonal to all three query
    // directions and term-free, so they can displace the plant ONLY if
    // the probe stage loses it — which is exactly what the gate checks.
    // Recall floor: planted relevant@1 = 1.0 over the ANN leg.
    val pads = (0 until 188).map { i =>
      val v = Array(0.0, 0.0, 0.0, 1.0)
      (2000L + i, "padding filler", v.toSeq)
    }.toDF("doc_id", "text", "embedding")
    val bigCorpus = corpus.unionByName(pads)
    val hybrid = QueryPack.hybridTopK(queryVecs, queryTerms, bigCorpus,
      k = 3, shortlistSize = 3).collect()
    val top1 = hybrid.filter(_.getInt(2) == 1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = (1L to 3L).count(q => top1.get(q).contains(q * 10 + 2)) / 3.0
    info(f"planted relevant@1 recall over the ANN shortlist: $recall%.2f")
    assert(recall >= 1.0,
      s"ANN-shortlisted hybrid must still rank the planted doc first, got $top1")
    // the keyword-stuffed spam doc shares the pads' direction — the
    // semantic gate must still exclude it
    assert(!hybrid.exists(_.getLong(1) % 10 == 4),
      "spam outside the ANN shortlist must never appear")
  }

  test("q107 on the test corpus: full ranked output, shortlist bound respected") {
    val out = QueryPack.hybridRetrieval(spark, "/root/testdata/sf0.1").collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(1L, 2L, 3L))
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length).toSeq,
        s"ranks must be dense from 1 for query $q")
      assert(rs.length <= 10)
      // scores are non-increasing with rank
      val byRank = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"scores must be non-increasing in rank for query $q")
    }
  }
}
