package graft.queries

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** q143's estimator gates: the exact branch (union below k ⇒ every
  * output column exact), the estimator branch on a planted overlap
  * (Jaccard/intersection within KMV sampling error at the chosen k),
  * and the structural invariants (m ≤ |U| ≤ k).
  */
class KmvOverlapSpec extends AnyFunSuite with SparkTest {

  // deterministic full-range 64-bit values (splitmix64 walk, fixed seed)
  private def hashes(n: Int, seed: Long): IndexedSeq[Long] = {
    var x = seed
    (0 until n).map { _ =>
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  private def frame(a: Seq[Long], b: Seq[Long]) = {
    import spark.implicits._
    (a.map(("train", _)) ++ b.map(("test", _))).toDF("split", "hu")
  }

  test("union below k: every column is exact") {
    val a = hashes(20, 1L)
    val b = hashes(20, 2L) ++ a.take(5) // overlap of exactly 5
    val row = QueryPack.kmvOverlapOf(frame(a, b), k = 64).collect().head
    assert(row.getAs[Long]("n_train_exact") == 20)
    assert(row.getAs[Long]("n_test_exact") == 25)
    assert(row.getAs[Long]("n_intersect_exact") == 5)
    assert(row.getAs[Long]("n_union_kmv") == 40) // exact union
    assert(row.getAs[Long]("n_intersect_kmv") == 5)
    assert(row.getAs[Long]("jaccard_kmv_ppm") == 5L * 1000000 / 40)
  }

  test("planted overlap: estimates land within KMV sampling error") {
    // universe 10k, each side 6k, true intersection 2k, union 10k,
    // Jaccard 0.2; at k=128 the union estimate errs ~1/sqrt(k) ≈ 9%
    // and the Jaccard ratio is binomial(k, 0.2) — bound both loosely
    // enough to be seed-robust, tight enough to catch a broken combine
    val u = hashes(10000, 42L)
    val a = u.slice(0, 6000)
    val b = u.slice(4000, 10000)
    val row = QueryPack.kmvOverlapOf(frame(a, b), k = 128).collect().head
    assert(row.getAs[Long]("n_intersect_exact") == 2000)
    val union = row.getAs[Long]("n_union_kmv")
    val inter = row.getAs[Long]("n_intersect_kmv")
    val jac = row.getAs[Long]("jaccard_kmv_ppm")
    assert(union > 7000 && union < 13000, s"union estimate $union")
    assert(inter > 800 && inter < 3500, s"intersect estimate $inter")
    assert(jac > 80000 && jac < 350000, s"jaccard ppm $jac")
  }

  test("invariants: m <= |U| <= k and estimator branch engages") {
    val u = hashes(1000, 7L)
    val a = u.slice(0, 600)
    val b = u.slice(300, 1000)
    val df = QueryPack.kmvOverlapOf(frame(a, b), k = 32)
    val row = df.collect().head
    // saturated sketches: the combined sketch is exactly k long and the
    // floored divisions stay on the integer grid
    assert(row.getAs[Long]("n_union_kmv") > 32,
      "estimator branch must engage past k")
    val jac = row.getAs[Long]("jaccard_kmv_ppm")
    assert(jac >= 0 && jac <= 1000000)
    assert(row.getAs[Long]("n_intersect_kmv") <= row.getAs[Long]("n_union_kmv"))
  }
}
