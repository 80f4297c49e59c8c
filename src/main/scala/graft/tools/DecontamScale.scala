package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decontamination-path measurement: runs the q55 join path and the q94
  * Bloom-prefilter path over the same corpus/eval split and reports
  * rows + wall + TOTAL SHUFFLE BYTES WRITTEN per path, so SCALING.md's
  * "fixed-byte eval index" claim carries measured bytes, not argument
  * (see the LshTune precedent). Also prints the serialized Bloom size —
  * the broadcast payload that replaces the eval hash relation.
  *
  * Usage: runMain graft.tools.DecontamScale <sfDir> [join|bloom|both]
  */
object DecontamScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args.lift(1).getOrElse("both")
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def run(name: String)(body: => Long): Unit = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"path":"$name","rows":$rows,"sec":${math.round(sec * 1000) / 1000.0},"shuffle_bytes":${shuffleBytes.get()}}""")
    }

    if (mode == "join" || mode == "both")
      run("join")(graft.queries.QueryPack.decontamination(spark, dir).count())
    if (mode == "bloom" || mode == "both") {
      // surface the fixed-size index payload alongside the run
      val docs = graft.Tables.documents(spark, dir)
      run("bloom")(graft.operators.Dedup.bloomDecontaminate(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text").count())
      val evalSh = docs.filter(col("doc_id") % 100 === 0)
        .select(explode(graft.functions.TextFunctions
          .shingleHashes(col("text"), 3)).as("h")).distinct().count()
      val bits = org.apache.spark.util.sketch.BloomFilter
        .optimalNumOfBits(math.max(evalSh, 1L), 0.01)
      println(s"""{"eval_distinct_shingles":$evalSh,"bloom_bytes":${bits / 8}}""")
    }
    spark.stop()
  }
}
