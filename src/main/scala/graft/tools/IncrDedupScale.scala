package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-dedup scale measurement: against a standing corpus of
  * documents, compare
  *   (a) FULL re-dedup of corpus+batch (`nearDuplicatePairs`) — what a
  *       pipeline without a persisted index pays per ingest;
  *   (b) one-time index build (band index + shingle hash sets written
  *       to parquet — the artifacts a deployment persists); and
  *   (c) the INCREMENTAL probe of the batch against the stored index
  *       (`incrementalNearDups`) — the per-ingest cost with the index.
  * Reports rows + wall + shuffle bytes per leg. The batch is sliced
  * from the corpus tail by id residue (same near-dup structure as the
  * corpus), so (a) and (c) answer the same admission question.
  *
  * Mode `ingest` drives the FULL production loop: 3 sequential
  * arrivals (id residues 1..3), each probing the stored index,
  * admitting its non-duplicates, and `appendToIndex`-ing them so the
  * next arrival sees them — per-step wall/shuffle must stay flat
  * (cost ∝ batch, not corpus or step number).
  *
  * Usage: runMain graft.tools.IncrDedupScale <sfDir> <workDir>
  *                [batchResidue=100] [full|probe|both|ingest]
  */
object IncrDedupScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val work = args(1)
    val residue = args.lift(2).map(_.toInt).getOrElse(100)
    val mode = args.lift(3).getOrElse("both")
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

    val docs = graft.Tables.documents(spark, dir)
    val existing = docs.filter(col("doc_id") % residue =!= 0)
    val batch = docs.filter(col("doc_id") % residue === 0)
    println(s"""{"corpus":${existing.count()},"batch":${batch.count()},"residue":$residue}""")

    if (mode == "full" || mode == "both")
      run("full_rededup")(graft.operators.Dedup.nearDuplicatePairs(
        docs, "doc_id", "text", numHashes = 64, bands = 16,
        shingleSize = 2, jaccardThreshold = 0.7).count())

    if (mode == "probe" || mode == "both") {
      run("index_build") {
        graft.operators.Dedup.minhashBandIndex(existing, "doc_id", "text",
          64, 16, 2).write.mode("overwrite").parquet(s"$work/band_index")
        graft.operators.Dedup.shingleHashSets(existing, "doc_id", "text", 2)
          .write.mode("overwrite").parquet(s"$work/hash_sets")
        spark.read.parquet(s"$work/band_index").count()
      }
      run("incremental_probe")(graft.operators.Dedup.incrementalNearDups(
        batch, "doc_id", "text",
        spark.read.parquet(s"$work/band_index"),
        spark.read.parquet(s"$work/hash_sets"),
        numHashes = 64, bands = 16, shingleSize = 2,
        jaccardThreshold = 0.7).count())
    }

    if (mode == "ingest") {
      val bandDir = s"$work/band_index"; val setsDir = s"$work/hash_sets"
      val standing = docs.filter(
        col("doc_id") % residue === 0 || col("doc_id") % residue > 3)
      run("index_build") {
        graft.operators.Dedup.minhashBandIndex(standing, "doc_id", "text",
          64, 16, 2).write.mode("overwrite").parquet(bandDir)
        graft.operators.Dedup.shingleHashSets(standing, "doc_id", "text", 2)
          .write.mode("overwrite").parquet(setsDir)
        spark.read.parquet(bandDir).count()
      }
      for (step <- 1 to 3) {
        val b = docs.filter(col("doc_id") % residue === step)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        run(s"ingest_$step") {
          val pairs = graft.operators.Dedup.incrementalNearDups(
              b, "doc_id", "text",
              spark.read.parquet(bandDir), spark.read.parquet(setsDir),
              64, 16, 2, 0.7)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nPairs = pairs.count()
          val dup = pairs.select(col("id")).distinct()
          val admitted = b.join(dup, b("doc_id") === dup("id"), "left_anti")
          graft.operators.Dedup.appendToIndex(admitted, "doc_id", "text",
            bandDir, setsDir, 64, 16, 2)
          pairs.unpersist(false)
          nPairs
        }
        b.unpersist(false)
      }
    }
    spark.stop()
  }
}
