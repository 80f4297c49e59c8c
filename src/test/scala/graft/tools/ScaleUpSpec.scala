package graft.tools

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** The wide (single-plan, replica-index-as-column) embeddings
  * replication must be ARITHMETICALLY IDENTICAL to the factor-way
  * union form it replaced: same key shift, same rotation index, same
  * splitmix ±1 sign pattern, float-exact. The union form pinned one
  * core in Catalyst analysis at factor 10000 (the 20M-vector corpus);
  * the wide form's plan is O(dim) regardless of factor.
  */
class ScaleUpSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("wide embeddings replication matches the union-form arithmetic exactly") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding").limit(50).cache()
    val d = 64
    val factor = 3
    val base = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    val wide = ScaleUp.replicateEmbeddings(emb, factor, d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    assert(wide.size == base.size * factor)
    for ((id, v) <- base; i <- 0 until factor) {
      val expected =
        if (i == 0) v
        else Vector.tabulate(d)(j =>
          v((j + i % d) % d) * ScaleUp.signAt(i.toLong, j).toFloat)
      assert(wide(id + i * 100000L) == expected, s"replica $i of vec $id")
    }
    // replica 0 is byte-identical (near-dup answer sets count on it)
    for ((id, v) <- base) assert(wide(id) == v)
  }
}
