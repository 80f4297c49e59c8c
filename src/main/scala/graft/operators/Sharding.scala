package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CmsSketch, TextHashExpressions}

/** Rendezvous (highest-random-weight) sharding — consistent shard
  * assignment for incremental pipelines: id goes to the shard s whose
  * weight `mix64(id XOR seed_s)` is the unsigned maximum (seeds are the
  * sketch family's splitmix row seeds, so the whole assignment replays
  * in SQL). The HRW property that modulo hashing lacks: growing N → N+1
  * shards moves ONLY the keys whose new-shard weight wins — every
  * surviving shard's key set is a superset-invariant (no key ever moves
  * BETWEEN old shards), so expanding a 1000-shard corpus layout
  * re-shuffles 1/(N+1) of 100 TB instead of (N−1)/N of it, and every
  * mover is a pure function of (id, N) — no coordination, no lookup
  * table, no driver state.
  *
  * Pure column arithmetic (N structs + one array_max), codegen-friendly
  * and map-side; ties (a mix64 collision across two seeds for the same
  * id) resolve deterministically to the higher shard index via the
  * struct's lexicographic max.
  */
object Sharding {

  /** Past this shard count the per-shard literal legs stop paying:
    * each leg is ~15 expression nodes, so N = 64 puts ~1k nodes in the
    * plan (fine, codegen-unrolled) but N = 4096 puts ~60k (analysis
    * cost + task-binary bloat — the same plan-size boundary
    * `assignCellsAuto` draws for centroid literals). Beyond it the
    * [[rendezvousShardWide]] form computes the SAME argmax from a
    * generated `sequence(0, N−1)` — O(1) plan size for any N. */
  val MaxLiteralLegs = 64

  /** The HRW shard of `id` among `nShards`, as a column expression.
    * Dispatches to the O(1)-plan-size wide form past [[MaxLiteralLegs]];
    * both routes are bit-identical (`ShardingSpec`). */
  def rendezvousShard(id: Column, nShards: Int): Column = {
    require(nShards > 0 && nShards <= (1 << 20),
      s"rendezvousShard: nShards must be in [1,2^20], got $nShards")
    if (nShards > MaxLiteralLegs) return rendezvousShardWide(id, nShards)
    // unsigned order of mix64 == signed order of (mix64 XOR Long.MinValue)
    val legs = (0 until nShards).map { s =>
      struct(
        TextHashExpressions.mix64(id.bitwiseXOR(lit(CmsSketch.rowSeed(s))))
          .bitwiseXOR(lit(Long.MinValue)).as("w"),
        lit(s).as("s"))
    }
    array_max(array(legs: _*)).getField("s")
  }

  /** [[rendezvousShard]] with the shard axis GENERATED instead of
    * unrolled: `transform(sequence(0, N−1), s → (w, s))` + array_max —
    * the seed `(s+1)·φ` is itself column arithmetic of the lambda
    * variable, so plan size is constant in N. Bit-identical to the
    * literal legs (same weights, same lexicographic tie rule). */
  def rendezvousShardWide(id: Column, nShards: Int): Column = {
    val maxed = array_max(transform(
      sequence(lit(0), lit(nShards - 1)),
      s => struct(
        TextHashExpressions.mix64(
          id.bitwiseXOR((s.cast("long") + 1L) * lit(CmsSketch.RowSeedGamma)))
          .bitwiseXOR(lit(Long.MinValue)).as("w"),
        s.as("s"))))
    maxed.getField("s")
  }
}
