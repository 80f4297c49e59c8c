package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-ANN scale measurement — the vector-side twin of
  * [[IncrDedupScale]]'s ingest mode: build the served IVF index ONCE
  * (cells + (vec_id, embedding, label) rows persisted to parquet — the
  * artifacts a deployment keeps), then drive 3 sequential 1%-of-corpus
  * arrivals through [[graft.operators.Similarity.ivfAssignFrozen]]:
  * each step routes its batch map-side against the frozen centroid
  * table and appends the routed rows to the index, with a serve probe
  * ([[graft.operators.Similarity.ivfTopK]]) after every step proving
  * the arrivals are findable.
  *
  * The claim under measurement: per-step INGEST cost is flat in corpus
  * size (the standing index is never read by the append — routing
  * touches batch × nCells, the write is batch-sized), while only the
  * SERVE leg pays the corpus-growth tax (probed cells hold more
  * candidates). Run at two scales and compare ingest walls/shuffle.
  *
  * Usage: runMain graft.tools.AnnIngestScale <sfDir> <workDir> [dim=64]
  */
object AnnIngestScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val work = args(1)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
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
      println(s"""{"leg":"$name","rows":$rows,"sec":${math.round(sec * 1000) / 1000.0},"shuffle_bytes":${shuffleBytes.get()}}""")
    }

    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 100 > 3)
    val cellsDir = s"$work/cells"; val indexDir = s"$work/ann_index"
    println(s"""{"corpus":${base.count()},"dim":$dim}""")

    run("index_build") {
      Similarity.centroidVectors(base, dim)
        .write.mode("overwrite").parquet(cellsDir)
      base.select(col("vec_id"), col("embedding"), col("label"))
        .write.mode("overwrite").parquet(indexDir)
      spark.read.parquet(indexDir).count()
    }
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()
    for (step <- 1 to 3) {
      val b = emb.filter(col("vec_id") % 100 === step)
        .select(col("vec_id"), col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.count() // materialize outside the timed leg: the scan is the
                // arrival, not the ingest work under measurement
      run(s"ingest_$step") {
        Similarity.ivfAssignFrozen(b, spark.read.parquet(cellsDir), dim)
          .write.mode("append").parquet(indexDir)
        val n = b.count() // cached — reports the batch size routed
        b.unpersist(false)
        n
      }
      run(s"serve_$step") {
        Similarity.ivfTopK(queries, spark.read.parquet(indexDir), 10, dim,
          nProbes = 3, Some(spark.read.parquet(cellsDir))).count()
      }
    }
    spark.stop()
  }
}
