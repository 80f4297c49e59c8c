package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native multi-table hyperplane bucketing semantics. */
class HyperplaneSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def bucketsOf(vec: Seq[Double], nPlanes: Int, nTables: Int): Seq[Long] =
    Seq(Tuple1(vec)).toDF("v")
      .select(VectorFunctions.hyperplaneBuckets($"v", nPlanes, nTables).as("b"))
      .collect().head.getSeq[Long](0)

  test("buckets are deterministic, one per table, within [0, 2^planes)") {
    val v = Seq(0.3, -1.2, 0.8, 2.5)
    val b1 = bucketsOf(v, 6, 4)
    assert(b1 == bucketsOf(v, 6, 4))
    assert(b1.length == 4)
    assert(b1.forall(b => b >= 0 && b < (1L << 6)))
    // tables hash with disjoint plane families — not all identical
    assert(b1.distinct.length > 1)
  }

  test("a vector and its tiny perturbation share buckets; its negation flips every plane") {
    val v = Seq(0.9, -0.4, 1.7, -0.2, 0.6)
    val nearby = v.map(_ + 1e-9)
    assert(bucketsOf(v, 8, 2) == bucketsOf(nearby, 8, 2))
    val flipped = bucketsOf(v.map(-_), 8, 2)
    assert(bucketsOf(v, 8, 2).zip(flipped)
      .forall { case (a, b) => (a ^ b) == 0xFFL })
  }

  test("float and double element types bucket identically") {
    val doubles = Seq(Tuple1(Seq(0.5, -1.5, 2.0))).toDF("v")
      .select(VectorFunctions.hyperplaneBuckets($"v", 5, 3).as("b"))
      .collect().head.getSeq[Long](0)
    val floats = Seq(Tuple1(Seq(0.5f, -1.5f, 2.0f))).toDF("v")
      .select(VectorFunctions.hyperplaneBuckets($"v", 5, 3).as("b"))
      .collect().head.getSeq[Long](0)
    assert(doubles == floats)
  }
}
