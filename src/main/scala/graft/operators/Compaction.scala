package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  /** File-level bin assignment — the shared core of [[plan]] (which
    * rolls it up per bin) and [[compactTo]] (which needs per-bin
    * MEMBERSHIP to execute the rewrite). One row per input file:
    * (part_key, file_id, size_bytes, kind, bin_id).
    */
  def assignBins(files: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val keeps = files
      .filter(col("size_bytes") >= targetBytes)
      .select(col("part_key"), col("file_id"), col("size_bytes"),
        lit("keep").as("kind"), col("file_id").as("bin_id"))
    val w = Window.partitionBy(col("part_key"))
      .orderBy(col("size_bytes").desc, col("file_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = files
      .filter(col("size_bytes") < targetBytes)
      .withColumn("cum", sum(col("size_bytes")).over(w))
      // cumulative BEFORE this file; sizes are non-negative so the
      // double floor is exact below 2^53 bytes per partition
      .select(col("part_key"), col("file_id"), col("size_bytes"),
        lit("compact").as("kind"),
        floor((col("cum") - col("size_bytes")) / lit(targetBytes.toDouble))
          .cast("long").as("bin_id"))
    keeps.unionByName(binned)
  }

  def plan(files: DataFrame, targetBytes: Long): DataFrame = {
    val assigned = assignBins(files, targetBytes)
    val keeps = assigned.filter(col("kind") === "keep")
      .select(col("part_key"), lit("keep").as("kind"),
        col("bin_id"), lit(1L).as("n_files"),
        col("size_bytes").as("bin_bytes"),
        col("file_id").as("first_file"), col("file_id").as("last_file"))
    val compacts = assigned.filter(col("kind") === "compact")
      .groupBy(col("part_key"), col("bin_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("size_bytes")).as("bin_bytes"),
        min(col("file_id")).as("first_file"),
        max(col("file_id")).as("last_file"))
      .select(col("part_key"), lit("compact").as("kind"), col("bin_id"),
        col("n_files"), col("bin_bytes"), col("first_file"), col("last_file"))
    keeps.unionByName(compacts)
  }

  /** EXECUTE a compaction plan against a flat parquet directory: plan
    * bins over the dir's data files ([[assignBins]], file_id = position
    * in name order), then rewrite each compact bin's members into ONE
    * output file and copy each keep file byte-identically. Output file
    * count = the plan's bin count, names `bin-<id>.parquet` /
    * `keep-<original name>`.
    *
    * The rewrite is ROW-GROUP CONCATENATION
    * (`ParquetFileWriter.appendFile`): member row groups stream into the
    * new file without decoding a single page — the same zero-decode
    * merge `parquet-tools merge` and table-format OPTIMIZE
    * implementations do. Content is conserved exactly by construction
    * (pages are copied, not re-encoded); all members must share one
    * schema (one table's files do).
    *
    * Scale shape: the driver holds only the manifest (one row per file)
    * and the bin list; execution is one Spark job with ONE TASK PER BIN
    * — each task's work is bounded by the bin payload (≈ targetBytes),
    * tasks touch disjoint files, and nothing is shuffled (the data
    * never enters Spark rows at all). `statsColumns` non-empty
    * regenerates the [[Layout.writeStatsTable]] sidecar for the NEW
    * file set, so table-planned pruning keeps working after the rewrite.
    *
    * Returns one row per output file:
    * (kind, bin_id, out_file, n_files, rows, bytes_in).
    */
  def compactTo(spark: SparkSession, srcDir: String, outDir: String,
                targetBytes: Long, statsColumns: Seq[String] = Nil): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(srcDir)
    val fs = root.getFileSystem(conf)
    val srcFiles = Layout.listParquetFiles(fs, root).sortBy(_.getName)
    require(srcFiles.nonEmpty, s"no parquet files under $srcDir")
    val sizes = srcFiles.map(p => fs.getFileStatus(p).getLen)
    import spark.implicits._
    val manifest = srcFiles.indices.toSeq
      .map(i => ("", i.toLong, sizes(i))).toDF("part_key", "file_id", "size_bytes")
    // file-level assignment collects at manifest scale (one short row
    // per file) — the same driver footprint as the listing itself
    val assigned = assignBins(manifest, targetBytes)
      .select(col("file_id"), col("kind"), col("bin_id"))
      .collect().map(r => (r.getLong(0).toInt, r.getString(1), r.getLong(2)))
    val outPath = new Path(outDir)
    fs.mkdirs(outPath)
    // (kind, binId, outName, member paths)
    val bins: Seq[(String, Long, String, Seq[String])] =
      assigned.filter(_._2 == "keep").map { case (fid, _, bid) =>
        ("keep", bid, s"keep-${srcFiles(fid).getName}",
          Seq(srcFiles(fid).toString))
      }.toSeq ++
      assigned.filter(_._2 == "compact").groupBy(_._3).toSeq.sortBy(_._1)
        .map { case (bid, members) =>
          ("compact", bid, f"bin-$bid%05d.parquet",
            members.sortBy(_._1).map(m => srcFiles(m._1).toString).toSeq)
        }
    val outDirStr = outPath.toString
    val results = spark.sparkContext
      .parallelize(bins, math.max(1, bins.size))
      .map { case (kind, bid, outName, members) =>
        import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
        import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
        val taskConf = new org.apache.hadoop.conf.Configuration()
        val dst = new Path(s"$outDirStr/$outName")
        var rows = 0L
        var bytesIn = 0L
        if (kind == "keep") {
          val src = new Path(members.head)
          val sfs = src.getFileSystem(taskConf)
          org.apache.hadoop.fs.FileUtil.copy(sfs, src,
            dst.getFileSystem(taskConf), dst, false, true, taskConf)
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(src, taskConf))
          try { rows = r.getRecordCount; bytesIn = sfs.getFileStatus(src).getLen }
          finally r.close()
        } else {
          // schema + key-value metadata (Spark's schema string) from the
          // first member — appendFile requires identical schemas anyway
          val first = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(members.head), taskConf))
          val (schema, kv) =
            try (first.getFooter.getFileMetaData.getSchema,
              first.getFooter.getFileMetaData.getKeyValueMetaData)
            finally first.close()
          val writer = new ParquetFileWriter(
            HadoopOutputFile.fromPath(dst, taskConf), schema,
            ParquetFileWriter.Mode.CREATE,
            org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong,
            org.apache.parquet.hadoop.ParquetWriter.MAX_PADDING_SIZE_DEFAULT)
          writer.start()
          members.foreach { m =>
            val src = new Path(m)
            val in = HadoopInputFile.fromPath(src, taskConf)
            val r = ParquetFileReader.open(in)
            try { rows += r.getRecordCount } finally r.close()
            bytesIn += src.getFileSystem(taskConf).getFileStatus(src).getLen
            writer.appendFile(in)
          }
          writer.end(kv)
        }
        (kind, bid, outName, members.size.toLong, rows, bytesIn)
      }.collect()
    if (statsColumns.nonEmpty)
      Layout.writeStatsTable(spark, outDir, statsColumns)
    results.toSeq
      .toDF("kind", "bin_id", "out_file", "n_files", "rows", "bytes_in")
  }
}
