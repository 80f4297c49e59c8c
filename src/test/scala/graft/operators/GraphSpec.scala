package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Triangle enumeration's contract: each triangle appears EXACTLY once
  * (the orientation argument), the enumeration matches a brute-force
  * triple scan on random graphs, and canonicalization collapses
  * direction/duplicates/self-loops.
  */
class GraphSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def bruteTriangles(edges: Set[(Long, Long)]): Set[(Long, Long, Long)] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.filter(e => e._1 != e._2)
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = adj.keys.toSeq.sorted
    (for {
      a <- nodes; b <- adj.getOrElse(a, Set.empty) if b > a
      c <- adj.getOrElse(b, Set.empty) if c > b && adj(a).contains(c)
    } yield (a, b, c)).toSet
  }

  test("undirected: direction, duplicates and self-loops collapse") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L)).toDF("src", "dst")
    val und = Graph.undirected(e, "src", "dst").as[(Long, Long)].collect().toSet
    assert(und == Set((1L, 2L), (2L, 3L)))
  }

  test("hand graph: K4 has 4 triangles, each counted once; corners credited 3×") {
    val k4 = (for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)).toDF("src", "dst")
    val und = Graph.undirected(k4, "src", "dst")
    val tri = Graph.triangles(und).as[(Long, Long, Long)].collect()
    assert(tri.length == 4)
    assert(tri.map(t => Set(t._1, t._2, t._3)).toSet.size == 4) // distinct corner sets
    val counts = Graph.triangleCounts(und).as[(Long, Long)].collect().toMap
    assert(counts == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("random graphs match the brute-force triple scan") {
    val rng = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      val edges = Set.fill(n * 3)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val df = edges.toSeq.toDF("src", "dst")
      val und = Graph.undirected(df, "src", "dst")
      val got = Graph.triangles(und).as[(Long, Long, Long)].collect()
        .map(t => (Seq(t._1, t._2, t._3).sorted match {
          case Seq(a, b, c) => (a, b, c)
        })).toSet
      assert(got.size == Graph.triangles(und).count(), s"trial $trial: duplicate triangles")
      assert(got == bruteTriangles(edges), s"trial $trial")
    }
  }

  test("plan: every join is an equi-join (no nested loop, no cartesian)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"))
    val e = docs.select(col("doc_id").as("src"),
      pmod(col("doc_id") * 31 + 17, lit(500L)).as("dst"))
    val plan = Graph.triangles(Graph.undirected(e, "src", "dst"))
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
