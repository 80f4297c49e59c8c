package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture table maintenance: the two primitives an
  * incrementally-maintained 100 TB table needs — latest-wins snapshot
  * compaction (the MERGE/apply-changes shape) and SCD-type-2 history
  * derivation (validity intervals from an update log).
  *
  * Both are one shuffle on the key: the window partitions by key and
  * orders by (version, tie-break), so the plan is a single exchange +
  * per-key sort regardless of how many updates a key has. At scale the
  * update log arrives bucketed by key (or the snapshot table is
  * bucketed), making compaction a zero-shuffle per-bucket sort; skewed
  * hot keys are AQE's problem, not the operator's. The tie-break column
  * makes the result deterministic under same-version updates — without
  * it, MERGE semantics are undefined exactly where CDC replays collide.
  */
object Cdc {

  /** SCD-type-2 history from an update log: every update becomes a
    * versioned row with `valid_from` = its version, `valid_to` = the
    * key's next version (null = still open), `is_current` = the open
    * row. Adjacent intervals share their boundary (half-open
    * [from, to) semantics); exactly one open row per key.
    */
  def scd2(updates: DataFrame, keyCols: Seq[String],
           version: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(version.asc, tieBreak.asc)
    updates
      .withColumn("valid_from", version)
      .withColumn("valid_to", lead(version, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Latest-wins compaction of a change log into the current snapshot:
    * keep each key's newest row (by version, then tie-break), then drop
    * keys whose newest row is a delete. An older delete followed by a
    * newer upsert resurrects the key — standard MERGE semantics. Rows
    * where `op` equals `deleteOp` carry the tombstone; anything else is
    * an upsert.
    */
  def applyChanges(changes: DataFrame, keyCols: Seq[String], version: Column,
                   tieBreak: Column, op: Column,
                   deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(version.desc, tieBreak.desc)
    changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && op =!= lit(deleteOp))
      .drop("_rn")
  }

  final case class CdcUpdate(key: Long, version: Long, tie: Long,
                             value: String, op: String)
  final case class CdcState(version: Long, tie: Long, value: String,
                            deleted: Boolean)
  final case class CdcCurrent(key: Long, version: Long, value: String,
                              is_deleted: Boolean)

  /** Streaming twin of [[applyChanges]]: latest-wins snapshot
    * maintenance as updates ARRIVE. Per key the state is ONE
    * (version, tie, value, deleted) tuple — the current row — updated
    * only by strictly newer (version, tie) arrivals, so late/replayed
    * CDC rows (a lower version landing in a later micro-batch) are
    * ignored exactly as the batch form's window would ignore them, and
    * the emitted changelog carries one [[CdcCurrent]] per key per batch
    * in which its current row CHANGED (tombstones emit is_deleted; a
    * later upsert resurrects). Folding the changelog by last-event-
    * per-key reproduces [[applyChanges]] over the full log — the spec's
    * equivalence gate.
    *
    * State is bounded by KEY CARDINALITY, not stream length (snapshot
    * semantics: the state IS the table), and has no timeout — the
    * retention question for a snapshot is compaction policy, not
    * eviction. Expects columns (key, version, tie, value, op).
    */
  def streamingLatest(updates: DataFrame,
                      deleteOp: String = "D"):
      org.apache.spark.sql.Dataset[CdcCurrent] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import updates.sparkSession.implicits._

    def update(key: Long, rows: Iterator[CdcUpdate],
               state: GroupState[CdcState]): Iterator[CdcCurrent] = {
      var cur = state.getOption
      var changed = false
      // deterministic within-batch fold order
      rows.toSeq.sortBy(r => (r.version, r.tie)).foreach { r =>
        val newer = cur.forall(s =>
          r.version > s.version || (r.version == s.version && r.tie > s.tie))
        if (newer) {
          cur = Some(CdcState(r.version, r.tie, r.value, r.op == deleteOp))
          changed = true
        }
      }
      if (changed) {
        val s = cur.get
        state.update(s)
        Iterator.single(CdcCurrent(key, s.version, s.value, s.deleted))
      } else Iterator.empty
    }

    updates.as[CdcUpdate]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}
