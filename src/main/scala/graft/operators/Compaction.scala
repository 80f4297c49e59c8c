package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance pass a 100 TB
  * parquet lake runs continuously (Delta/Iceberg `OPTIMIZE` bin-packing):
  * group undersized files into rewrite bins of ≈ `targetBytes` each,
  * leave already-compact files alone (rewriting them is wasted I/O).
  *
  * The packing rule is a deterministic first-fit over the size-descending
  * file order: within each table partition, sort small files by
  * (size DESC, file_id ASC), take the running byte total, and assign
  * `bin = floor((cumsative_before) / targetBytes)`. Every NON-FINAL
  * bin's payload lands in [targetBytes − max_member, targetBytes +
  * max_member) — the same bounded-overshoot guarantee greedy FFD gives
  * (each partition's LAST bin holds the leftover tail and may undershoot
  * arbitrarily, exactly like FFD's final bin) — but unlike true
  * FFD (a sequential loop over bins) the cumulative-quotient rule is ONE
  * window over the manifest, so planning stays a metadata-sized
  * distributed query: no driver loop, no per-bin state, and the manifest
  * for a 10⁵-file partition is 10⁵ tiny rows.
  *
  * Scale shape: one hash partitioning on the table-partition key feeds
  * both the window sort and the final per-bin rollup (the exchange is
  * reused); nothing corpus-sized moves — the operator only ever touches
  * the file MANIFEST, never file contents.
  */
object Compaction {

  /** Plan compaction bins over a file manifest.
    *
    * @param files manifest with columns (`part_key`, `file_id`,
    *              `size_bytes`) — one row per data file
    * @param targetBytes rewrite-bin target payload; files at or above it
    *                    are emitted as `kind = 'keep'` singletons
    * @return one row per output bin:
    *         (part_key, kind, bin_id, n_files, bin_bytes,
    *          first_file, last_file)
    */
  def plan(files: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val keeps = files
      .filter(col("size_bytes") >= targetBytes)
      .select(col("part_key"), lit("keep").as("kind"),
        col("file_id").as("bin_id"), lit(1L).as("n_files"),
        col("size_bytes").as("bin_bytes"),
        col("file_id").as("first_file"), col("file_id").as("last_file"))
    val w = Window.partitionBy(col("part_key"))
      .orderBy(col("size_bytes").desc, col("file_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = files
      .filter(col("size_bytes") < targetBytes)
      .withColumn("cum", sum(col("size_bytes")).over(w))
      // cumulative BEFORE this file; sizes are non-negative so the
      // double floor is exact below 2^53 bytes per partition
      .withColumn("bin_id",
        floor((col("cum") - col("size_bytes")) / lit(targetBytes.toDouble))
          .cast("long"))
    val compacts = binned
      .groupBy(col("part_key"), col("bin_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("size_bytes")).as("bin_bytes"),
        min(col("file_id")).as("first_file"),
        max(col("file_id")).as("last_file"))
      .select(col("part_key"), lit("compact").as("kind"), col("bin_id"),
        col("n_files"), col("bin_bytes"), col("first_file"), col("last_file"))
    keeps.unionByName(compacts)
  }
}
