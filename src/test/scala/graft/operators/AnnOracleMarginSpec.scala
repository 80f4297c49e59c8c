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
}
