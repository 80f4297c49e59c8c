package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Graph-clustered curation gate ([[Graph.communityCuration]], q142's
  * operator) — the PRODUCTION composition: mutual kNN graph on the
  * √n-cell auto quantizer → connected components → per-community
  * degree-ranked survivor + budget-proportional hash sample. Planted
  * communities pin membership end-to-end; hand graphs pin the survivor
  * argmax and the ceil budget exactly.
  */
class GraphCurationSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def fnvLow20(id: Long): Long = {
    val h = org.apache.spark.sql.graft.TextHashOps.fnv64(
      UTF8String.fromString(id.toString))
    ((h % 1048576L) + 1048576L) % 1048576L
  }

  test("planted communities survive the production path end-to-end") {
    // 4 well-separated families, each size EXACTLY k+1 so every
    // member's top-3 list is saturated in-family: the mutual graph is
    // COMPLETE per family, community = family, every degree = size-1,
    // survivor = lowest id. Ids interleave with outlier vectors whose
    // nearest neighbors are family members but never reciprocally (the
    // family lists are full) — they must not appear in the output.
    val rng = new scala.util.Random(17)
    val d = 16
    val dirs = Array.fill(4)(Array.fill(d)(rng.nextGaussian()))
      .map { v => val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val fams = Seq(0L -> Seq(1L, 5L, 9L, 13L), 1L -> Seq(2L, 6L, 10L, 14L),
      2L -> Seq(3L, 7L, 11L, 15L), 3L -> Seq(4L, 8L, 12L, 16L))
    val members = fams.flatMap { case (f, ids) => ids.map { id =>
      (id, dirs(f.toInt).map(x => (x + 0.02 * rng.nextGaussian()).toFloat).toSeq)
    } }
    val isolated = Seq(100L, 101L).map { id =>
      (id, Array.fill(d)(rng.nextGaussian().toFloat).toSeq)
    }
    val df = (members ++ isolated).toDF("vec_id", "embedding")
    val edges = Similarity.mutualKnnGraphAuto(df, k = 3, dim = d)
    val out = Graph.communityCuration(edges, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val expected = fams.map { case (_, ids) =>
      val n = ids.size.toLong
      val sampled = ids.minBy(i => (fnvLow20(i), i))
      (ids.min, n, ids.min, n - 1, 1L, sampled)
    }.sortBy(_._1)
    assert(out.toSeq == expected,
      s"got ${out.toSeq}\nexpected $expected")
  }

  test("survivor is the max-degree member, ties to lowest id") {
    // hand graph, one community: hub 7 with degree 4; others lower
    val edges = Seq((7L, 1L), (7L, 2L), (7L, 3L), (7L, 4L), (1L, 2L))
      .toDF("id_a", "id_b")
    val r = Graph.communityCuration(edges, "id_a", "id_b").collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 1L)   // cluster = min id
    assert(r.head.getLong(1) == 5L)   // members
    assert(r.head.getLong(2) == 7L)   // hub survives
    assert(r.head.getLong(3) == 4L)   // its degree
  }

  test("degree tie goes to the lowest id") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id_a", "id_b")
    val r = Graph.communityCuration(edges, "id_a", "id_b").collect()
    assert(r.head.getLong(2) == 1L && r.head.getLong(3) == 2L)
  }

  test("budget is ceil(n/denom) per community, sampled in hash order") {
    // path graph of 25 nodes -> one community, ceil(25/10) = 3 sampled
    val edges = (1L until 25L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val r = Graph.communityCuration(edges, "id_a", "id_b").collect()
    assert(r.length == 1 && r.head.getLong(1) == 25L)
    assert(r.head.getLong(4) == 3L)
    val want = (1L to 25L).sortBy(i => (fnvLow20(i), i)).take(3).sum
    assert(r.head.getLong(5) == want)
    // denom dial: ceil(25/4) = 7
    val r4 = Graph.communityCuration(edges, "id_a", "id_b", sampleDenom = 4)
      .collect()
    assert(r4.head.getLong(4) == 7L)
  }

  test("deterministic across input partitionings") {
    val rng = new scala.util.Random(23)
    val edges = (1 to 300).map { _ =>
      (rng.nextInt(80).toLong + 1, rng.nextInt(80).toLong + 1)
    }.filter(e => e._1 != e._2).toDF("id_a", "id_b")
    val a = Graph.communityCuration(edges, "id_a", "id_b")
      .collect().map(_.toString).sorted.toSeq
    val b = Graph.communityCuration(edges.repartition(13), "id_a", "id_b")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
