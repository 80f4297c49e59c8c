package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental IVF ingest gate ([[Similarity.ivfAssignFrozen]] /
  * [[Similarity.ivfIncrementalTopK]], q145's operators): routing is
  * pinned against hand-planted families, the quantizer is proven FROZEN
  * (a skewed batch cannot move it), appended vectors are immediately
  * findable, and malformed arrivals are dropped at the gate.
  */
class IvfIncrementalSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val d = 8
  // three orthogonal family directions
  private def axis(i: Int, scale: Double = 1.0): Seq[Float] =
    Seq.tabulate(d)(j => if (j == i) scale.toFloat else 0.0f)
  private def noisy(i: Int, eps: Double, at: Int): Seq[Float] =
    Seq.tabulate(d)(j =>
      if (j == i) 1.0f else if (j == at) eps.toFloat else 0.0f)

  private def base = Seq(
    (0L, axis(0), 0L), (1L, noisy(0, 0.05, 3), 0L),
    (2L, axis(1), 1L), (3L, noisy(1, 0.05, 4), 1L),
    (4L, axis(2), 2L), (5L, noisy(2, 0.05, 5), 2L)
  ).toDF("vec_id", "embedding", "label")

  test("frozen routing sends each arrival to its family's cell") {
    val cells = Similarity.centroidVectors(base, d)
    val batch = Seq(
      (100L, noisy(0, 0.1, 6)), (101L, noisy(1, 0.1, 6)),
      (102L, noisy(2, 0.1, 6))
    ).toDF("vec_id", "embedding")
    val routed = Similarity.ivfAssignFrozen(batch, cells, d)
      .select(col("vec_id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(routed.toSeq == Seq((100L, 0L), (101L, 1L), (102L, 2L)))
  }

  test("the quantizer is frozen: a skewed batch cannot move routing") {
    // halfway between family 0 and family 1, nudged toward 1 — routes
    // to cell 1 under the BASE centroids even when the batch carries
    // 50 vectors of borderline-directed mass that a retrained cell 0
    // would absorb.
    val borderline = Seq.tabulate(d)(j =>
      if (j == 0) 0.98f else if (j == 1) 1.0f else 0.0f)
    val skew = (0 until 50).map(i => (200L + i, borderline))
    val batch = (skew :+ (300L -> borderline)).toDF("vec_id", "embedding")
    val cells = Similarity.centroidVectors(base, d)
    val routedCell = Similarity.ivfAssignFrozen(batch, cells, d)
      .filter(col("vec_id") === 300L).select(col("label"))
      .collect().head.getLong(0)
    assert(routedCell == 1L)
    // the same vector routed by centroids retrained over base ∪ batch
    // (the skew mass folded into cell 0) WOULD flip to cell 0 —
    // proving the frozen/retrained distinction is observable, not
    // vacuous, on this geometry
    val retrained = Similarity.centroidVectors(
      base.unionByName(batch.withColumn("label", lit(0L))), d)
    val flipped = Similarity.ivfAssignFrozen(
        Seq((300L, borderline)).toDF("vec_id", "embedding"), retrained, d)
      .select(col("label")).collect().head.getLong(0)
    assert(flipped == 0L)
  }

  test("appended vectors are immediately findable (two-arrival serve)") {
    val batch = Seq((100L, noisy(0, 0.02, 7))).toDF("vec_id", "embedding")
    val queries = Seq((0L, axis(0))).toDF("query_id", "embedding")
    val out = Similarity.ivfIncrementalTopK(queries, base, batch,
        k = 3, dim = d, nProbes = 1)
      .select(col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2)
    // probe 1 cell (family 0): the appended 100 and base 1 lead
    assert(out.map(_._1).toSeq == Seq(100L, 1L),
      s"got ${out.toSeq}")
  }

  test("malformed arrivals are dropped at the gate") {
    val batch = Seq(
      (100L, Some(noisy(0, 0.1, 6))),
      (101L, None),                       // null vector
      (102L, Some(Seq(1.0f, 2.0f)))       // wrong dim
    ).toDF("vec_id", "embedding")
    val cells = Similarity.centroidVectors(base, d)
    val kept = Similarity.ivfAssignFrozen(batch, cells, d)
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(100L))
  }
}
