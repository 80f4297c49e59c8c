package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Contamination-estimate scale measurement (q143): against the same
  * train/test shingle stream, compare
  *   (a) the SKETCH path (`kmvOverlapSketch`) — two k-min aggregates +
  *       arithmetic on 2·k longs, the production shape that at 100 TB
  *       runs from per-partition `kmv_hashes` arrays without touching
  *       raw data again; and
  *   (b) the EXACT legs (per-split distinct counts + the distinct
  *       intersection) — what q143 carries as its gate and what a
  *       join-based decontamination sizing would pay.
  * Reports wall + the estimate/exact values, so the row reads as both
  * a cost ratio and an accuracy check at scale.
  *
  * Usage: runMain graft.tools.DecontamScale <sfDir> [k=64]
  */
object DecontamScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args.lift(1).map(_.toInt).getOrElse(64)
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
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            shuffleBytes.addAndGet(
              e.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    val docs = graft.Tables.documents(spark, dir)
    val n = docs.count() // also warms the scan

    def timed[T](body: => T): (T, Double, Long) = {
      // listener events drain asynchronously — the short settle after
      // the blocking action keeps per-leg shuffle attribution honest
      Thread.sleep(500)
      val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val r = body
      Thread.sleep(500)
      (r, (System.nanoTime() - t0) / 1e9, shuffleBytes.get() - b0)
    }

    val (sketchRow, sketchSec, sketchShuffle) = timed {
      graft.queries.QueryPack.kmvOverlapSketch(
        graft.queries.QueryPack.splitShingleHashes(docs), k).collect().head
    }
    val (exactRow, exactSec, exactShuffle) = timed {
      val sh = graft.queries.QueryPack.splitShingleHashes(docs)
      val per = sh.groupBy(col("split"))
        .agg(countDistinct(col("hu")).as("n_exact"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val inter = sh.distinct()
        .groupBy(col("hu")).agg(countDistinct(col("split")).as("ns"))
        .filter(col("ns") === 2).count()
      (per.getOrElse("train", 0L), per.getOrElse("test", 0L), inter)
    }
    val (nTrain, nTest, nInter) = exactRow
    val unionExact = nTrain + nTest - nInter
    println(s"""{"n_docs":$n,"k":$k,""" +
      s""""sketch_sec":${math.rint(sketchSec * 1000) / 1000},""" +
      s""""exact_sec":${math.rint(exactSec * 1000) / 1000},""" +
      s""""sketch_shuffle_bytes":$sketchShuffle,""" +
      s""""exact_shuffle_bytes":$exactShuffle,""" +
      s""""n_union_kmv":${sketchRow.getAs[Long]("n_union_kmv")},""" +
      s""""n_intersect_kmv":${sketchRow.getAs[Long]("n_intersect_kmv")},""" +
      s""""jaccard_kmv_ppm":${sketchRow.getAs[Long]("jaccard_kmv_ppm")},""" +
      s""""n_union_exact":$unionExact,"n_intersect_exact":$nInter,""" +
      s""""n_train_exact":$nTrain,"n_test_exact":$nTest}""")
    spark.stop()
  }
}
