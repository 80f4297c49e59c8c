package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration by degree orientation — the classic
  * shuffle-bounded graph join (Cohen's MapReduce scheme / Suri–Vassilvitskii):
  * orient every undirected edge from its lower-(degree, id) endpoint to
  * the higher, so each node's out-degree in the oriented graph is
  * O(√m) — wedges (two out-edges sharing a source) then number
  * Σ outdeg² ≤ m^{3/2} instead of the Σ deg² a naive neighbor join
  * pays, which is the difference between a hub node of degree 10⁶
  * generating 10¹² candidate pairs or none. Each triangle is counted
  * exactly once: its corners have a unique orientation order, the wedge
  * forms at the lowest corner, and the closing edge check is an
  * equi-join against the oriented edge set.
  *
  * Plan shape: two hash aggregates (canonicalize + degree), three
  * equi-joins (degree attach, wedge self-join on the shared source,
  * closing-edge join on the candidate pair). Everything shuffles on
  * node or pair keys — no nested loop, no driver state; hub skew in the
  * wedge join is bounded by the orientation and beyond that is AQE's
  * skew-split problem, not the operator's.
  */
object Graph {

  /** Canonical undirected edge set from a directed edge list: endpoints
    * sorted (u < v), self-loops dropped, duplicates (including reverse
    * duplicates) collapsed. */
  def undirected(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** All triangles of a canonical undirected edge set ([[undirected]]'s
    * output): one row (a, b, c) per triangle, corners in orientation
    * order (ascending (degree, id)). */
  def triangles(und: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("d").as("dv")), Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"),
      when(uFirst, col("dv")).otherwise(col("du")).as("dt"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.dt") < col("e2.dt") ||
            (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t"))))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
    // closing edge: oriented edges are unique, so the inner join cannot
    // duplicate a wedge
    wedges.join(oriented.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-node triangle participation counts (each triangle credits all
    * three corners). */
  def triangleCounts(und: DataFrame): DataFrame =
    triangles(und)
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
}
