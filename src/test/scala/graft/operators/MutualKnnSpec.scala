package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** mutualKnnGraph contract: edges appear iff BOTH endpoints rank the
  * other in their top-k within probed cells — checked against a
  * brute-force recomputation on a corpus whose cells the 2-probe search
  * covers fully, plus the hub asymmetry case mutuality must prune.
  */
class MutualKnnSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float], Int)*) =
    rows.map { case (id, v, l) => (id, v, l) }.toDF("vec_id", "embedding", "label")

  test("two tight clusters: mutual edges only within clusters") {
    val d = 8
    def v(base: Double, jitter: Double) =
      (0 until d).map(i => (base + (if (i == 0) jitter else 0.0)).toFloat)
    val df = vecs(
      (1L, v(1.0, 0.00), 0), (2L, v(1.0, 0.01), 0), (3L, v(1.0, 0.02), 0),
      (4L, v(-1.0, 0.00), 1), (5L, v(-1.0, 0.01), 1), (6L, v(-1.0, 0.02), 1))
    val g = Similarity.mutualKnnGraph(df, k = 2, dim = d, nProbes = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // k=2 over 3-member clusters: every in-cluster pair is mutual
    assert(g == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L)))
  }

  test("agrees with brute-force mutual top-k when probes cover all cells") {
    val rng = new scala.util.Random(3)
    val d = 6
    val rows = (1L to 40L).map { i =>
      (i, Seq.fill(d)((rng.nextDouble() * 2 - 1).toFloat), (i % 2).toInt)
    }
    val df = vecs(rows: _*)
    val g = Similarity.mutualKnnGraph(df, k = 3, dim = d, nProbes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force in Scala: exact cosine top-3 per vector, then mutual
    val m = rows.map { case (id, v, _) => id -> v.map(_.toDouble) }.toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val topk = m.map { case (id, v) =>
      id -> m.toSeq.filter(_._1 != id)
        .map { case (j, u) => (j, cos(v, u)) }
        .sortBy { case (j, c) => (-c, j) }.take(3).map(_._1).toSet
    }
    val brute = (for {
      (i, ni) <- topk.toSeq; j <- ni
      if i < j && topk(j).contains(i)
    } yield (i, j)).toSet
    assert(g == brute)
  }

  test("hub asymmetry: one-sided edges are pruned") {
    val d = 4
    // hub at origin-ish direction; satellites all point near the hub but
    // far from each other, k=1: every satellite's top-1 is the hub, the
    // hub's top-1 is its closest satellite — only THAT edge is mutual
    val df = vecs(
      (1L, Seq(1f, 0f, 0f, 0f), 0),            // hub
      (2L, Seq(0.9f, 0.45f, 0f, 0f), 0),       // closest satellite
      (3L, Seq(0.9f, -0.5f, 0f, 0f), 0),
      (4L, Seq(0.9f, 0f, 0.6f, 0f), 0))
    val g = Similarity.mutualKnnGraph(df, k = 1, dim = d, nProbes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g == Set((1L, 2L)))
  }

  test("auto (k-means) quantizer recovers brute mutual edges on separable clusters") {
    val rng = new scala.util.Random(9)
    val d = 8
    // 4 tight clusters of 12 around orthogonal axes — every top-2
    // neighbor is in-cluster, so any quantizer that keeps clusters
    // probe-reachable must reproduce the brute mutual graph
    val rows = (0 until 48).map { i =>
      val axis = i % 4
      val v = (0 until d).map(j =>
        (if (j == axis * 2) 1.0 else 0.0) + rng.nextDouble() * 0.05)
      (i.toLong, v.map(_.toFloat), axis)
    }
    val df = vecs(rows: _*)
    val auto = Similarity.mutualKnnGraphAuto(df, k = 2, dim = d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val m = rows.map { case (id, v, _) => id -> v.map(_.toDouble) }.toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val topk = m.map { case (id, v) =>
      id -> m.toSeq.filter(_._1 != id)
        .map { case (j, u) => (j, cos(v, u)) }
        .sortBy { case (j, c) => (-c, j) }.take(2).map(_._1).toSet
    }
    val brute = (for {
      (i, ni) <- topk.toSeq; j <- ni
      if i < j && topk(j).contains(i)
    } yield (i, j)).toSet
    assert(auto == brute)
  }

  test("rank columns carry each direction's own rank") {
    val d = 4
    val df = vecs(
      (1L, Seq(1f, 0f, 0f, 0f), 0),
      (2L, Seq(0.99f, 0.1f, 0f, 0f), 0),
      (3L, Seq(0.9f, 0.3f, 0f, 0f), 0))
    val rows = Similarity.mutualKnnGraph(df, k = 2, dim = d, nProbes = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getInt(3))))
      .toMap
    assert(rows((1L, 2L)) == ((1, 1)))  // each other's nearest
    assert(rows((2L, 3L)) == ((2, 1)))  // 3 is 2's #2; 2 is 3's #1
  }
}
