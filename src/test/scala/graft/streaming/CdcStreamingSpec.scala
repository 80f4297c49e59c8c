package graft.streaming

import graft.SparkTest
import graft.operators.Cdc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CDC streaming twin's contract: per-key latest-wins state across
  * micro-batches — strictly newer (version, tie) arrivals replace, LATE
  * replays (lower version in a later batch) are ignored, tombstones
  * emit is_deleted and later upserts resurrect, state survives
  * checkpoint restart, and folding the emitted changelog by
  * last-event-per-key reproduces the batch applyChanges over the full
  * log.
  */
class CdcStreamingSpec extends AnyFunSuite with SparkTest {

  import java.nio.file.Files

  test("latest-wins across batches: late replays ignored, tombstone+resurrect, restart") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("cdc-src").toString
    val outDir = Files.createTempDirectory("cdc-out").toString
    val ckptDir = Files.createTempDirectory("cdc-ckpt").toString
    def append(rows: Seq[(Long, Long, Long, String, String)]): Unit =
      rows.toDF("key", "version", "tie", "value", "op")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def startQuery() = {
      val stream = spark.readStream
        .schema("key bigint, version bigint, tie bigint, value string, op string")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      Cdc.streamingLatest(stream)
        .writeStream
        // update-mode changelog durably appended per micro-batch
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Cdc.CdcCurrent], _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckptDir)
        .outputMode("update").start()
    }
    // batch 1: initial upserts
    append(Seq((1L, 1L, 1L, "a1", "U"), (2L, 1L, 2L, "b1", "U")))
    // batch 2: key 1 advances to v3; key 2 tombstoned; key 3 appears
    append(Seq((1L, 3L, 3L, "a3", "U"), (2L, 5L, 4L, "", "D"),
      (3L, 2L, 5L, "c2", "U")))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    // batch 3 AFTER RESTART: a LATE replay of key 1 at v2 (must be
    // ignored — state v3 survived the checkpoint) and key 2 resurrected
    append(Seq((1L, 2L, 6L, "a2-late", "U"), (2L, 7L, 7L, "b7", "U")))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
      .select("key", "version", "value", "is_deleted").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    // no event for the late replay: key 1 emitted only at v1 and v3
    assert(out.count(_._1 == 1L) == 2)
    assert(!out.exists(_._3 == "a2-late"), "late replay must not win")
    // tombstone event then resurrection event for key 2
    assert(out.filter(_._1 == 2L).sortBy(_._2).map(e => (e._4, e._3)).toSeq ==
      Seq((false, "b1"), (true, ""), (false, "b7")))

    // changelog folded by last-event-per-key == batch applyChanges
    val all = Seq(
      (1L, 1L, 1L, "a1", "U"), (2L, 1L, 2L, "b1", "U"),
      (1L, 3L, 3L, "a3", "U"), (2L, 5L, 4L, "", "D"), (3L, 2L, 5L, "c2", "U"),
      (1L, 2L, 6L, "a2-late", "U"), (2L, 7L, 7L, "b7", "U"))
      .toDF("key", "version", "tie", "value", "op")
    val batchSnap = Cdc.applyChanges(all, Seq("key"), col("version"),
        col("tie"), col("op"))
      .select("key", "value").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val folded = out.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      .filter(!_._2._4).map { case (k, e) => k -> e._3 }
    assert(folded == batchSnap,
      s"changelog fold $folded must equal batch snapshot $batchSnap")
  }
}
