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

  /** Community curation over a similarity graph — the decision step of
    * graph-clustered semantic dedup / cluster-balanced sampling: given
    * an undirected edge list (e.g. [[Similarity.mutualKnnGraphAuto]]'s
    * mutual pairs), form communities (connected components, min-id
    * label), then per community pick
    *   - a SURVIVOR: the max-degree member (most-connected ≈ medoid;
    *     degree is an integer so no float ulp can flip the pick; ties
    *     to the lowest id), and
    *   - a budget-proportional SAMPLE: ceil(n_members / sampleDenom)
    *     members in (fnv64-low-20-bits, id) order — deterministic
    *     pseudo-random, replayable in plain SQL.
    * Output: one row per community —
    * (cluster_id, n_members, kept_id, max_degree, n_sampled,
    *  sum_sampled_ids).
    *
    * Scale shape: everything past the caller's graph build is ids-only.
    * Degree is one hash aggregate over edges; membership⋈degree an id
    * equi-join; community size, survivor argmax, and sample rank all
    * ride windows over ONE cluster_id hash partitioning (no second
    * exchange); the final rollup groups the sampled sliver.
    */
  def communityCuration(edges: DataFrame, aCol: String, bCol: String,
                        sampleDenom: Int = 10): DataFrame = {
    require(sampleDenom > 0, "sampleDenom must be positive")
    import org.apache.spark.sql.expressions.Window
    // Materialize the ids-only edge list ONCE: it is consumed by BOTH
    // the connected-components build (an eager count+collect at
    // construction) and the degree aggregate below — left lazy, the
    // entire upstream graph build (the expensive mutual-kNN pipeline in
    // q142's case) would execute twice. localCheckpoint truncates to
    // fixed-width id pairs; everything downstream replays rows, not the
    // build. (Measured: q142 3.90 → ~2.8 s at sf0.1.)
    val e = edges.select(col(aCol).as("id_a"), col(bCol).as("id_b"))
      .localCheckpoint(true)
    val cc = Dedup.connectedComponents(e, "id_a", "id_b")
    val deg = e.select(col("id_a").as("node"))
      .unionByName(e.select(col("id_b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val w = Window.partitionBy(col("cluster_id"))
    val hw = Window.partitionBy(col("cluster_id"))
      .orderBy(col("h").asc, col("node").asc)
    cc.join(deg, Seq("node"))
      // low 20 bits of fnv64: two's-complement low bits equal the
      // unsigned value's low bits, so the signed engine hash and a SQL
      // replay's UBIGINT order identically
      .withColumn("h",
        pmod(org.apache.spark.sql.graft.TextHashExpressions
          .fnv64(col("node").cast("string")), lit(1048576L)))
      .withColumn("n_members", count(lit(1)).over(w))
      .withColumn("max_degree", max(col("degree")).over(w))
      .withColumn("kept_id",
        min(when(col("degree") === col("max_degree"), col("node"))).over(w))
      .withColumn("hr", row_number().over(hw))
      .filter(col("hr") <= expr(s"(n_members + ${sampleDenom - 1}) div $sampleDenom"))
      .groupBy(col("cluster_id"), col("n_members"), col("kept_id"),
        col("max_degree"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("node")).as("sum_sampled_ids"))
      .select(col("cluster_id"), col("n_members"), col("kept_id"),
        col("max_degree"), col("n_sampled"), col("sum_sampled_ids"))
  }
}
