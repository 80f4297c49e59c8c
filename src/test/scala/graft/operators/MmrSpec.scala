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
    val got = Similarity.mmrTopK(queries, corpus, k = 2, shortlistSize = 2)
      .collect()
    assert(got.isEmpty, s"NaN-only shortlist must emit no picks, got ${got.toSeq}")
    // a mixed shortlist still emits the finite-scored picks
    val mixed = Seq(
      (1L, Seq(Double.NaN, 0.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val got2 = Similarity.mmrTopK(queries, mixed, k = 2, shortlistSize = 2)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(got2 == Map(1 -> 2L), s"finite pick must survive NaN peers: $got2")
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
