package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorHashOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins the numeric safety argument that lets the ANN queries
  * (q24/q28/q38) carry full DuckDB oracles: the LSH bucket bits are the
  * SIGNS of hyperplane projections, and on the test corpus every
  * projection sits far enough from zero that cross-engine summation
  * differences (~1e-15 relative; DuckDB's list_dot_product is not
  * bit-identical to the expression's sequential loop) can never flip a
  * sign. If new test data ever lands a projection inside the noise band,
  * this spec fails loudly instead of the oracle diff failing obscurely.
  */
class AnnOracleMarginSpec extends AnyFunSuite with SparkTest {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val embeddings = graft.Tables.embeddings(spark, sfDir)

  // q24 uses 4 tables × 6 planes = planes 0..23; q28 uses 2 × 4 ⊂ 0..7
  private val TotalPlanes = 24

  private def projections(emb: Seq[Float]): Array[Double] = {
    val proj = new Array[Double](TotalPlanes)
    var d = 0
    while (d < emb.length) {
      val x = emb(d).toDouble
      var p = 0
      while (p < TotalPlanes) { proj(p) += x * VectorHashOps.weight(d, p); p += 1 }
      d += 1
    }
    proj
  }

  test("every hyperplane projection clears the cross-engine noise band") {
    val rows = embeddings.select(col("embedding")).collect()
    assert(rows.nonEmpty)
    var minAbs = Double.MaxValue
    rows.foreach { r =>
      val proj = projections(r.getSeq[Float](0))
      var p = 0
      while (p < TotalPlanes) { minAbs = math.min(minAbs, math.abs(proj(p))); p += 1 }
    }
    // measured ~1.4e-5 on the driver corpora; 1e-9 still leaves six
    // orders of magnitude over double rounding noise
    assert(minAbs > 1e-9,
      s"projection margin $minAbs too close to zero for a cross-engine sign contract")
  }

  test("native bucket expression matches the driver-side weight replay") {
    val rows = embeddings
      .select(col("embedding"),
        graft.functions.VectorFunctions.hyperplaneBuckets(col("embedding"), 6, 4).as("b"))
      .collect()
    rows.foreach { r =>
      val proj = projections(r.getSeq[Float](0))
      val expected = (0 until 4).map { t =>
        (0 until 6).foldLeft(0L)((acc, i) =>
          (acc << 1) | (if (proj(t * 6 + i) >= 0.0) 1L else 0L))
      }
      assert(r.getSeq[Long](1) == expected)
    }
  }

  test("PQ encode margins clear the noise band; PQ recall vs brute is recorded") {
    // q104's oracle replays the per-subspace L2 argmin; a cross-engine
    // flip needs a vector whose two best sub-centroids are equidistant
    // within summation noise. Measure the actual worst margin.
    val dim = 64; val nSub = 8; val sub = dim / nSub
    val cents = Similarity.centroidVectors(embeddings, dim)
      .orderBy(col("label")).collect().map(_.getSeq[Double](1).toArray)
    val vecs = embeddings.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    var minMargin = Double.MaxValue
    vecs.foreach { case (_, e) =>
      var s = 0
      while (s < nSub) {
        val ds = cents.map { c =>
          var d2 = 0.0; var j = 0
          while (j < sub) {
            val diff = e(s * sub + j) - c(s * sub + j); d2 += diff * diff; j += 1
          }
          d2
        }.sorted
        minMargin = math.min(minMargin, ds(1) - ds(0))
        s += 1
      }
    }
    assert(minMargin > 1e-9,
      s"PQ argmin margin $minMargin inside the cross-engine noise band")

    // recall@10 vs exact brute on the same queries — the honest quality
    // numbers next to IVF's (engine-side, like q20's recall gate; the
    // ORACLE checks determinism, this checks quality). The label-book
    // ADC twin is coarse by construction (10 cells ≈ 3.3 bits/subspace)
    // and is recorded info-only; the TRAINED path with exact re-rank is
    // the production search and carries the floor.
    val queries = embeddings.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val brute = Similarity.bruteForceTopK(queries, embeddings, 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(queries, embeddings, 10, dim, nSub)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twinRecall = (brute & pq).size.toDouble / brute.size
    info(f"label-book ADC twin recall@10 vs brute: $twinRecall%.3f")
    // the trained gate runs on the 500-vector corpus: 50 vectors is a
    // degenerate PQ regime (top-10 is 20% of the corpus and any
    // candidate budget is a corpus-sized fraction)
    val emb500 = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val q500 = emb500.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val brute500 = Similarity.bruteForceTopK(q500, emb500, 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = Similarity.pqTopKTrained(q500, emb500, 10, dim,
        nSub = 16, kPerSub = 64, candidates = 100)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute500 & trained).size.toDouble / brute500.size
    info(f"trained PQ (16x64, 100-cand re-rank) recall@10 vs brute at 500 vectors: $recall%.3f")
    assert(recall >= 0.8,
      s"trained-PQ recall collapsed ($recall) — codebook build regressed")
  }

  test("q145 routing argmax margins clear the cross-engine noise band") {
    // the incremental-ingest oracle adds one NEW rank decision to q38's
    // family: each batch vector's (cosine DESC, label) argmax over the
    // frozen base centroids. A cross-engine flip needs a batch vector
    // nearly equidistant (in cosine) from its two best cells — measure
    // the actual worst best-vs-second margin on both driver corpora.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = graft.Tables.embeddings(spark, dir)
      val dim = 64
      val cents = Similarity.centroidVectors(
          emb.filter(col("vec_id") % 10 =!= 7), dim)
        .orderBy(col("label")).collect().map(_.getSeq[Double](1).toArray)
      val batch = emb.filter(col("vec_id") % 10 === 7)
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        dp / (math.sqrt(na) * math.sqrt(nb))
      }
      var minMargin = Double.MaxValue
      batch.foreach { v =>
        val sims = cents.map(c => cos(v, c)).sorted(Ordering[Double].reverse)
        minMargin = math.min(minMargin, sims(0) - sims(1))
      }
      info(f"worst routing margin at $dir: $minMargin%.3e")
      assert(minMargin > 1e-9,
        s"routing argmax margin $minMargin inside the noise band at $dir")
    }
  }
}
