package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-walked MMR semantics: an exact duplicate of the top pick must
  * NOT take rank 2 when a diverse alternative exists; λ = 1 collapses
  * to pure relevance order; ties break to the lower id; short
  * shortlists emit min(k, n) rows.
  */
class MmrSpec extends AnyFunSuite with SparkTest {

  test("duplicate of the top pick is deferred in favor of a diverse doc") {
    import spark.implicits._
    // q = e1. A (id 1) rel .6; A' (id 2) = A exactly; B (id 3) rel .55
    // but NEGATIVE sim to A (−.338). After picking A:
    //   A' : .7·.6 − .3·1      = .120
    //   B  : .7·.55 − .3·(−.338) = .486  → B wins rank 2
    val corpus = Seq(
      (1L, Seq(0.6, 0.8, 0.0, 0.0)),
      (2L, Seq(0.6, 0.8, 0.0, 0.0)),
      (3L, Seq(0.55, -0.8352245, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("query_id", "embedding")
    val got = Similarity.mmrTopK(queries, corpus, k = 3, shortlistSize = 3)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 1L, 2 -> 3L, 3 -> 2L),
      s"MMR must defer the exact duplicate: $got")
    // pure relevance (the same shortlist) would rank A, A', B
    val rel = Similarity.bruteForceTopK(queries, corpus, 3)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(rel == Map(1 -> 1L, 2 -> 2L, 3 -> 3L))
  }

  test("lambda = 1 is pure relevance order; ties break to the lower id") {
    import spark.implicits._
    val corpus = Seq(
      (5L, Seq(0.6, 0.8, 0.0, 0.0)),
      (4L, Seq(0.6, 0.8, 0.0, 0.0)), // identical — id 4 must outrank id 5
      (6L, Seq(0.3, 0.954, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val queries = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("query_id", "embedding")
    val got = Similarity.mmrTopK(queries, corpus, 3, 3, lambdaRel = 1.0)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 4L, 2 -> 5L, 3 -> 6L), s"got $got")
  }

  test("all-NaN shortlist (NaN-element embeddings) emits nothing instead of crashing") {
    import spark.implicits._
    // a NaN element poisons the whole cosine (zero-NORM vectors are
    // already guarded to 0.0 by VectorFunctions.normalize); NaN sorts
    // FIRST under desc so these rows fill the bruteForceTopK shortlist —
    // the greedy loop must stop cleanly (no pick beats -Inf under `>`),
    // not index picked(-1)
    val corpus = Seq(
      (1L, Seq(Double.NaN, 0.0, 0.0, 0.0)),
      (2L, Seq(Double.NaN, 1.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val queries = Seq((9L, Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("query_id", "embedding")
    // brute leg: it's the one that feeds NaN rows through (the ANN
    // default drops non-finite vectors at index build); the greedy
    // guard under test is leg-independent
    val got = Similarity.mmrTopK(queries, corpus, k = 2, shortlistSize = 2,
        shortlist = Similarity.bruteForceTopK)
      .collect()
    assert(got.isEmpty, s"NaN-only shortlist must emit no picks, got ${got.toSeq}")
    // a mixed shortlist still emits the finite-scored picks
    val mixed = Seq(
      (1L, Seq(Double.NaN, 0.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val got2 = Similarity.mmrTopK(queries, mixed, k = 2, shortlistSize = 2,
        shortlist = Similarity.bruteForceTopK)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(got2 == Map(1 -> 2L), s"finite pick must survive NaN peers: $got2")
  }

  test("ANN (IVF-PQ) shortlist leg: planted diverse pick survives the probe stage") {
    import spark.implicits._
    // 200-doc corpus in dim 8: a tight near-duplicate family around e1
    // (ids 0..9), a diverse mid-relevance family near e2 (ids 10..19,
    // cosine ~0.45 to the query), and 180 pads ORTHOGONAL to the query
    // (dims 3..7 only). Query = e1. The cosine top-20 shortlist is
    // exactly the two families; a relevance-only ranking fills the top
    // with e1 near-dups; MMR must pull an e2-family doc into the
    // top-3 — and the IVF-PQ leg must keep BOTH families alive through
    // cell probing for that to happen (the "planted doc survives the
    // probe stage" floor).
    def unit(v: Array[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    // the diverse family is ANTI-similar to the relevant family in dim
    // 2 (the duplicate-deferral geometry of the hand-walked test: after
    // picking a rel-0.6 family doc, a dup scores .7·.6 − .3·1 = .12
    // while a diverse doc scores .7·.55 − .3·(−.34) ≈ .49) — same-
    // hemisphere families can never beat the dup penalty at λ = 0.7
    val rows = (0 until 200).map { i =>
      val v = new Array[Double](8)
      if (i < 10) { v(0) = 0.6; v(1) = 0.8; v(2) = 0.001 * (i % 7) } // relevant near-dups
      else if (i < 20) { v(0) = 0.55; v(1) = -0.8352245; v(2) = 0.001 * (i % 5) } // diverse
      else { v(4 + i % 4) = 1.0; v(3) = 0.7 }                    // pads ⊥ query
      (i.toLong, unit(v))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = Seq((1000L, unit(Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))))
      .toDF("query_id", "embedding")
    // default leg IS the ANN leg
    val ann = Similarity.mmrTopK(queries, corpus, k = 3, shortlistSize = 20)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(ann(1) < 10L, s"top pick must be from the relevant family: $ann")
    assert((1 to 3).exists(r => ann(r) >= 10L && ann(r) < 20L),
      s"diverse family must surface by rank 3 over the ANN shortlist: $ann")
    // and the brute-leg twin agrees on the same corpus (exhaustive
    // probing at this size makes membership identical)
    val brute = Similarity.mmrTopK(queries, corpus, k = 3, shortlistSize = 20,
        shortlist = Similarity.bruteForceTopK)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(brute(1) < 10L &&
      (1 to 3).exists(r => brute(r) >= 10L && brute(r) < 20L))
  }

  test("ANN leg drops non-finite corpus vectors at index build instead of crashing") {
    import spark.implicits._
    val rows = (0 until 120).map { i =>
      val v = new Array[Double](4); v(i % 4) = 1.0; v((i + 1) % 4) = 0.1 * (i % 9)
      (i.toLong, v.toSeq)
    } :+ ((999L, Seq(Double.NaN, 1.0, 0.0, 0.0)))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = Seq((5000L, Seq(1.0, 0.05, 0.0, 0.0)))
      .toDF("query_id", "embedding")
    val got = Similarity.mmrTopK(queries, corpus, k = 5, shortlistSize = 10)
      .collect()
    assert(got.length == 5)
    assert(!got.exists(_.getLong(1) == 999L), "NaN vector must not be indexed")
  }

  test("fewer candidates than k emits min(k, n) dense ranks per query") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val queries = Seq((9L, Seq(1.0, 0.0))).toDF("query_id", "embedding")
    val got = Similarity.mmrTopK(queries, corpus, k = 2, shortlistSize = 5)
      .collect().map(r => (r.getInt(2), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1, 1L), (2, 2L)))
  }
}
