package graft.operators

import graft.SparkTest
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates the literal-vs-broadcast centroid routing switch: past the
  * plan-literal byte budget the centroid matrix moves from a typedlit
  * in every stage's task binary to ONE broadcast per executor — and the
  * scoring must be BIT-IDENTICAL either way (same argmax, ties,
  * null-poisoning), so the route is pure transport, never semantics.
  */
class BroadcastRoutingSpec extends AnyFunSuite with SparkTest {

  private val dim = 64
  private lazy val corpus = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
  private lazy val queries = corpus.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding"))

  test("cell assignment is bit-identical between literal and broadcast routes") {
    val (_, centroids) = Similarity.kMeans(corpus, "vec_id", "embedding",
      k = 32, dim, iterations = 2)
    val v = VectorFunctions.normalize(col("embedding"))
    val bc = spark.sparkContext.broadcast(centroids)
    val both = corpus.select(col("vec_id"),
        Similarity.assignCells(v, centroids).as("lit"),
        org.apache.spark.sql.graft.VectorExpressions
          .cellArgmaxBroadcast(v, bc).as("bcst"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"vec ${r.getLong(0)}: literal=${r.getInt(1)} broadcast=${r.getInt(2)}")
    }
    // poison contract matches: wrong-dim vector nulls under BOTH routes
    import spark.implicits._
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val p = bad.select(
      Similarity.assignCells(col("embedding"), centroids).as("lit"),
      org.apache.spark.sql.graft.VectorExpressions
        .cellArgmaxBroadcast(col("embedding"), bc).as("bcst")).first()
    assert(p.isNullAt(0) && p.isNullAt(1))
  }

  test("ivfPqTopK: forced-broadcast route returns the literal route's exact rows") {
    val lit = Similarity.ivfPqTopK(queries, corpus, 10, dim,
      candidates = 100, iterations = 2,
      planLiteralBudgetBytes = Long.MaxValue) // always literal
    val bcst = Similarity.ivfPqTopK(queries, corpus, 10, dim,
      candidates = 100, iterations = 2,
      planLiteralBudgetBytes = 0L) // always broadcast
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    assert(rows(lit) == rows(bcst),
      "broadcast routing must be transport-only: identical ranked output")
  }

  test("the default budget puts the 2M-scale quantizer on the broadcast route") {
    // sf10's 447 cells × dim 64 stays on the zero-machinery literal;
    // the 2M-vector auto build (√2M ≈ 1414 cells) flips to broadcast
    assert(Similarity.centroidLiteralBytes(447, 64) <=
      Similarity.DefaultPlanLiteralBudgetBytes)
    assert(Similarity.centroidLiteralBytes(1414, 64) >
      Similarity.DefaultPlanLiteralBudgetBytes)
  }
}
