package graft.operators

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming twin of the q92 duplicated-span detector
  * ([[Dedup.streamingSpanDups]]): windows already seen in the stream are
  * flagged as they arrive, state is one entry per live window hash, and
  * event-time timeout evicts entries `retentionSeconds` after their last
  * sighting — the bounded-state contract of every streaming dedup here.
  */
class StreamingSpanDupSpec extends AnyFunSuite with SparkTest {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("span re-arrivals flag against the first-seen document; state evicts on timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val events = Dedup.streamingSpanDups(
      input.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", windowTokens = 3,
      watermarkDelay = "10 seconds", retentionSeconds = 60L)
    val q = events.writeStream.format("memory")
      .queryName("span_dups").outputMode("append").start()
    try {
      // batch 1: doc 1 first; doc 2 shares exactly the "a b c" window
      input.addData((1L, "a b c d e", ts(100)), (2L, "a b c x y", ts(101)))
      q.processAllAvailable()
      val b1 = spark.table("span_dups")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(b1 === Set((2L, 1L)), s"only doc 2's shared window flags: $b1")

      // batch 2: doc 3 repeats doc 1 verbatim → all 3 windows flag, first = 1
      input.addData((3L, "a b c d e", ts(105)))
      q.processAllAvailable()
      val b2 = spark.table("span_dups")
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(b2.count(_ == (3L, 1L)) === 3, s"doc 3 must flag 3 windows vs doc 1: ${b2.toSeq}")

      // batch 3a: disjoint tokens far in the future advance the watermark
      // past every timeout (last sighting 105 + 60 s retention << 7200)
      input.addData((8L, "zz yy xx ww", ts(7200)))
      q.processAllAvailable()
      // batch 3b: doc 9 repeats the text AFTER eviction → seen as fresh,
      // no flags (the state for those windows is gone)
      input.addData((9L, "a b c d e", ts(7201)))
      q.processAllAvailable()
      val b3 = spark.table("span_dups").collect().map(_.getLong(0)).toSet
      assert(!b3.contains(9L),
        s"evicted windows must not flag the post-retention re-arrival: $b3")
    } finally q.stop()
  }

  test("a document never flags against itself (per-doc window hashes are distinct)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val events = Dedup.streamingSpanDups(
      input.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", windowTokens = 2,
      watermarkDelay = "10 seconds", retentionSeconds = 60L)
    val q = events.writeStream.format("memory")
      .queryName("span_dups_self").outputMode("append").start()
    try {
      // "p q p q p q" repeats the window "p q" three times WITHIN the doc
      input.addData((1L, "p q p q p q", ts(100)))
      q.processAllAvailable()
      assert(spark.table("span_dups_self").count() === 0L)
    } finally q.stop()
  }
}
