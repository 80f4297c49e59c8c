package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale. Partition pruning
  * (EnvelopeStore) eliminates whole directories by partition column;
  * Z-ORDER clustering makes per-FILE min/max statistics selective on
  * MULTIPLE columns at once: interleaving the bits of two dimensions
  * makes z-adjacent rows adjacent in both, so a file holding a z-range
  * holds a tight rectangle in (a, b) — a predicate on EITHER column
  * prunes most files, where a single-column sort makes the second
  * column's min/max ranges span everything. The 100 TB lever: the same
  * parquet bytes, rewritten in z-order, turn full scans into few-file
  * reads for two-dimensional slices.
  */
object Layout {

  /** Morton (Z-order) key: interleaves the low `bits` bits of two
    * non-negative integer columns — bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Pure integer shifts and ors (codegen'd, no
    * HOF, no shuffle); values must already be bucketed into
    * [0, 2^bits) — compose with pmod/width_bucket upstream.
    */
  def zOrderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.cast("long").bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.cast("long").bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Monotone bucketing of an integer-valued column into [0, 2^bits) —
    * the upstream companion [[zOrderKey]]'s contract asks for. MONOTONE
    * (equal-width, via width_bucket) is the requirement: a modular map
    * like pmod would scatter adjacent values across buckets and destroy
    * exactly the locality z-ordering exists to create. Values outside
    * [minV, maxV] clamp to the edge buckets.
    */
  def zBucket(c: Column, minV: Long, maxV: Long, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    require(maxV >= minV, s"need maxV >= minV, got [$minV, $maxV]")
    val n = 1L << bits
    greatest(lit(0L), least(lit(n - 1),
      width_bucket(c.cast("double"), lit(minV.toDouble),
        lit(maxV.toDouble + 1.0), lit(n)) - 1))
  }

  /** Rewrite a DataFrame into z-ordered layout: range-partition by the
    * z-key (so files cover contiguous z-ranges → tight min/max on both
    * dimensions) and sort within partitions. One exchange; follow with
    * `.write.parquet(...)` — the per-file stats then prune on either
    * dimension. */
  def repartitionByZOrder(df: DataFrame, a: Column, b: Column,
                          numPartitions: Int, bits: Int = 16): DataFrame = {
    val z = zOrderKey(a, b, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Inclusive numeric range predicate on one column — the unit of
    * [[statsPrunedParquet]]'s pruning (conjunctions of these are what
    * file-level min/max statistics can decide). */
  final case class ColRange(column: String, lo: Double, hi: Double) {
    require(lo <= hi, s"empty range [$lo, $hi] on $column")
  }

  /** Stats-pruned parquet read — the scan-planner half of the z-order
    * story, so "few-file reads" is something this engine DOES rather
    * than something a hypothetical Delta/Iceberg layer would do: read
    * each file's parquet FOOTER (driver-side metadata pass, no data
    * pages), keep only files where some row group's [min, max] on every
    * range column intersects its range, and hand Spark just those files
    * — the executed FileSourceScanExec then shows the pruned `numFiles`
    * for real. The row-level filter is still applied (file stats only
    * bound, never decide rows), so the result is ALWAYS identical to
    * `spark.read.parquet(dir).filter(...)` on any layout — pruning can
    * only change which files are opened (spec'd on all three ZOrderPrune
    * layouts).
    *
    * Scale shape: the footer pass is O(#files) driver metadata I/O —
    * exactly the planning pass every lakehouse scan planner runs; at
    * 100 TB a deployment amortizes it into a stats table maintained at
    * write time (Delta's checkpoint / Iceberg's manifest), which this
    * function's per-file (min, max) tuples are the contents of.
    * Columns with missing/untyped stats keep the file (never prune on
    * unknowns); files whose schema lacks the column keep too.
    */
  def statsPrunedParquet(spark: SparkSession, dir: String,
                         ranges: Seq[ColRange]): DataFrame = {
    require(ranges.nonEmpty, "statsPrunedParquet needs at least one range")
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
    def statBounds(st: org.apache.parquet.column.statistics.Statistics[_])
        : Option[(Double, Double)] = st match {
      case s: org.apache.parquet.column.statistics.LongStatistics =>
        Some((s.getMin.toDouble, s.getMax.toDouble))
      case s: org.apache.parquet.column.statistics.IntStatistics =>
        Some((s.getMin.toDouble, s.getMax.toDouble))
      case s: org.apache.parquet.column.statistics.DoubleStatistics =>
        Some((s.getMin, s.getMax))
      case s: org.apache.parquet.column.statistics.FloatStatistics =>
        Some((s.getMin.toDouble, s.getMax.toDouble))
      case _ => None // binary/boolean/unknown: not a numeric range — keep
    }
    val kept = files.filter { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        blocks.exists { bg =>
          ranges.forall { r =>
            bg.getColumns.asScala.find(_.getPath.toDotString == r.column) match {
              case Some(cc) =>
                val st = cc.getStatistics
                if (st == null || st.isEmpty || !st.hasNonNullValue) true
                else statBounds(st) match {
                  case Some((mn, mx)) => mx >= r.lo && mn <= r.hi
                  case None => true
                }
              case None => true // column absent in this file: keep
            }
          }
        }
      } finally reader.close()
    }
    val pred = ranges.map(r => col(r.column).between(r.lo, r.hi)).reduce(_ && _)
    if (kept.isEmpty)
      // preserve the schema; lit(false) folds to an empty LocalRelation
      spark.read.parquet(dir).filter(lit(false))
    else
      spark.read.parquet(kept.map(_.toString).toIndexedSeq: _*).filter(pred)
  }
}
