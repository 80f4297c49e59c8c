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
}
