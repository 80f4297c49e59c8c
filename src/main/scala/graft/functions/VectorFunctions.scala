package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float|double>` columns. The dot
  * product — the pairwise hot path of every ANN/near-dup operator — is a
  * native codegen'd Catalyst expression (tight primitive loop, no
  * per-pair intermediate array); the HOF formulation is kept as
  * [[dotHof]] for reference/benchmark comparison. All math is done in
  * double after an exact float→double widening.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.arrayDot(a, b)

  /** Higher-order-function dot product (interpreted lambdas; ~the cost
    * baseline the native expression beats).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Unit-normalize once per row (let-bound norm — see
    * TextFunctions.bind), so pairwise cosine reduces to a single dot
    * product instead of three aggregate trees per pair.
    */
  def normalize(a: Column): Column =
    graft.functions.TextFunctions.bind(norm(a)) { n =>
      when(n === 0.0, transform(a, x => x.cast("double")))
        .otherwise(transform(a, x => x.cast("double") / n))
    }

  /** Native multi-table hyperplane bucketing — one pass over the vector
    * for all nTables × nPlanes projections (see
    * [[org.apache.spark.sql.graft.VectorHashOps]]); returns one packed
    * bucket id per table. THE bucketing primitive for every LSH path.
    */
  def hyperplaneBuckets(vec: Column, nPlanes: Int, nTables: Int): Column =
    org.apache.spark.sql.graft.HyperplaneExpressions.hyperplaneBuckets(vec, nPlanes, nTables)

  /** Element-wise vector mean as ONE native aggregate (double[dim+1]
    * buffer, associative partial merge) — the centroid/k-means-update
    * primitive; replaces `array(avg(element_at(v, i)))` × dim.
    */
  def vectorAvg(vec: Column, dim: Int): Column =
    org.apache.spark.sql.graft.VectorAggregates.vectorAvg(vec, dim)
}
