package graft.tools

import graft.operators.Layout
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Measures what z-order layout actually BUYS at scan time — the claim
  * `Layout.repartitionByZOrder`'s docstring makes ("turn full scans into
  * few-file reads for two-dimensional slices") as recorded numbers
  * instead of an assertion. Writes the same table three ways (unsorted
  * hash, single-column sort, z-order on two dims), runs the same slice
  * predicates over each, and reports per layout:
  *
  *  - `files_overlap`: files whose per-file (min, max) on the predicate
  *    columns intersect the predicate — the file count a stats-pruning
  *    scan planner (Delta/Iceberg data skipping; the 100 TB deployment
  *    shape) reads. Computed from the written files' real statistics.
  *  - `scan_rows`: numOutputRows of the executed FileSourceScanExec —
  *    rows vanilla Spark's parquet reader actually materialized after
  *    row-group/page pruning by the pushed predicate.
  *  - `bytes_read` (task-metrics listener) and wall seconds.
  *
  * Usage: runMain graft.tools.ZOrderPrune <sfDir> <outBase> [nFiles]
  *   dims: a = l_orderkey (the natural single-sort key), b =
  *   l_extendedprice (uncorrelated with every key column — ScaleUp's
  *   replica shifting correlates the keys with each other, which would
  *   flatter the single-sort baseline); predicates: "2d" (10% slice on
  *   each dim) and "b_only" (1% slice on the SECOND dim — the case a
  *   single-column sort cannot prune).
  */
object ZOrderPrune {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val base = args(1)
    val nFiles = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    // a = the natural single-sort key; b = l_extendedprice, chosen
    // because it is UNCORRELATED with the keys (corr ≈ 0.003): every
    // ScaleUp key column is replica-shifted in lockstep, so sorting by
    // one key accidentally localizes every other key and the comparison
    // would flatter the single-column sort
    val (a, b) = ("l_orderkey", "l_extendedprice")
    val st = li.agg(min(col(a)), max(col(a)),
      min(col(b).cast("double")), max(col(b).cast("double"))).first()
    val (aMin, aMax) = (st.getLong(0), st.getLong(1))
    val (bMin, bMax) = (st.getDouble(2), st.getDouble(3))
    val bits = 12

    def sliceOn(lo: Double, hi: Double, fLo: Double, fHi: Double): (Double, Double) = {
      val span = hi - lo
      (lo + span * fLo, lo + span * fHi)
    }
    val (a1d, a2d) = sliceOn(aMin.toDouble, aMax.toDouble, 0.45, 0.55)
    val (a1, a2) = (a1d.toLong, a2d.toLong)
    val (b1, b2) = sliceOn(bMin, bMax, 0.45, 0.55)
    val (bo1, bo2) = sliceOn(bMin, bMax, 0.50, 0.51)
    val preds: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "2d" -> (col(a).between(a1, a2) && col(b).between(b1, b2)),
      "b_only" -> col(b).between(bo1, bo2))

    val layouts: Seq[(String, DataFrame)] = Seq(
      "unsorted" -> li.repartition(nFiles),
      "sorted_a" -> li.repartitionByRange(nFiles, col(a)).sortWithinPartitions(col(a)),
      "zorder" -> Layout.repartitionByZOrder(li,
        Layout.zBucket(col(a), aMin, aMax, bits),
        Layout.zBucket(col(b), math.floor(bMin).toLong,
          math.ceil(bMax).toLong, bits), nFiles, bits))
    layouts.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$base/$name")
    }

    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case ad: AdaptiveSparkPlanExec => findScans(ad.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScans(qs.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }

    layouts.foreach { case (name, _) =>
      val path = s"$base/$name"
      // write-time stats table: the SAME footer pass statsPrunedParquet
      // pays per query, paid once at write time (Delta-checkpoint /
      // Iceberg-manifest shape); its wall is the amortized cost and its
      // per-file share is what a 10⁵-file deployment multiplies out
      val tw = System.nanoTime()
      Layout.writeStatsTable(spark, path, Seq(a, b))
      val statsWriteSec = (System.nanoTime() - tw) / 1e9
      println(s"""{"layout":"$name","stats_write_sec":${math.round(statsWriteSec * 1000) / 1000.0}}""")
      // per-file stats from the files as written — what a data-skipping
      // planner consults
      val fileStats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(a)).as("a_min"), max(col(a)).as("a_max"),
          min(col(b).cast("double")).as("b_min"),
          max(col(b).cast("double")).as("b_max"))
        .collect()
      val nTotal = fileStats.length
      preds.foreach { case (pname, pred) =>
        // file ranges [min,max] intersecting the predicate rectangle
        val overlap = pname match {
          case "2d" => fileStats.count(r =>
            r.getLong(2) >= a1 && r.getLong(1) <= a2 &&
              r.getDouble(4) >= b1 && r.getDouble(3) <= b2)
          case _ => fileStats.count(r =>
            r.getDouble(4) >= bo1 && r.getDouble(3) <= bo2)
        }
        val t0 = System.nanoTime()
        val before = bytesRead.get()
        val q = spark.read.parquet(path).filter(pred)
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
        // collect() so the metrics land on THIS QueryExecution (first()
        // would execute a separate limited one)
        val row = q.collect().head
        val wall = (System.nanoTime() - t0) / 1e9
        val read = bytesRead.get() - before
        val scans = findScans(q.queryExecution.executedPlan)
        val scanRows = scans.map(_.metrics("numOutputRows").value).sum
        // the IN-ENGINE pruned read (Layout.statsPrunedParquet): footer
        // metadata pass + file-sliced scan — executed numFiles is the
        // file count actually opened, matching files_overlap
        val ranges = pname match {
          case "2d" => Seq(Layout.ColRange(a, a1.toDouble, a2.toDouble),
            Layout.ColRange(b, b1, b2))
          case _ => Seq(Layout.ColRange(b, bo1, bo2))
        }
        val tp = System.nanoTime()
        val pq2 = Layout.statsPrunedParquet(spark, path, ranges)
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
        val prow = pq2.collect().head
        val pWall = (System.nanoTime() - tp) / 1e9
        val pFiles = findScans(pq2.queryExecution.executedPlan)
          .map(_.metrics("numFiles").value).sum
        require(prow.getLong(0) == row.getLong(0),
          s"pruned read changed results on $name/$pname")
        // the TABLE-planned pruned read: per-query planning is one read
        // of the tiny sidecar (no footer I/O) — must open the identical
        // file set and return identical rows
        val tt = System.nanoTime()
        val tq = Layout.tableStatsPrunedParquet(spark, path, ranges)
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
        val trow = tq.collect().head
        val tWall = (System.nanoTime() - tt) / 1e9
        val tFiles = findScans(tq.queryExecution.executedPlan)
          .map(_.metrics("numFiles").value).sum
        require(trow.getLong(0) == row.getLong(0),
          s"table-planned read changed results on $name/$pname")
        require(tFiles == pFiles,
          s"table planner opened $tFiles files vs footer's $pFiles on $name/$pname")
        println(s"""{"layout":"$name","pred":"$pname","files_total":$nTotal,"files_overlap":$overlap,"scan_rows":$scanRows,"match_rows":${row.getLong(0)},"bytes_read":$read,"wall_sec":${math.round(wall * 1000) / 1000.0},"pruned_files_opened":$pFiles,"pruned_wall_sec":${math.round(pWall * 1000) / 1000.0},"table_files_opened":$tFiles,"table_wall_sec":${math.round(tWall * 1000) / 1000.0}}""")
      }
    }
    spark.stop()
  }
}
