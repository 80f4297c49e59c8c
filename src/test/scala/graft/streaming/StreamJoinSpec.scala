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
      // watermark eviction: push event time far forward; the 5 old
      // buffered rows must leave state, only the 4 recent rows remain
      impressions.addData((9L, ts(5000)))
      clicks.addData((9L, ts(5000)))
      query.processAllAvailable()
      impressions.addData((8L, ts(5001)))
      clicks.addData((8L, ts(5001)))
      query.processAllAvailable()
      assert(query.lastProgress.stateOperators.head.numRowsTotal == 4,
        "join state must hold only the recent rows after eviction")
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

      // state boundedness: after the ts(300) flush the join buffers only
      // the single live doc's banded rows (everything older aged out).
      // Pushing event time far forward must evict it too, leaving exactly
      // the two new docs' rows — broken eviction would read 3× that.
      val perDoc = query.lastProgress.stateOperators
        .find(_.operatorName.contains("symmetricHashJoin")).get.numRowsTotal
      docs.addData((100L, "aaa bbb ccc ddd eee fff", ts(5000)))
      query.processAllAvailable()
      docs.addData((101L, "ggg hhh iii jjj kkk lll", ts(5001)))
      query.processAllAvailable()
      val stateAfter = query.lastProgress.stateOperators
        .find(_.operatorName.contains("symmetricHashJoin")).get.numRowsTotal
      assert(stateAfter == 2 * perDoc,
        s"join state must hold only live docs: perDoc=$perDoc after=$stateAfter")
    } finally query.stop()
  }

  test("streaming embedding near-dup pairs: hyperplane-LSH twin on a vector stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = 8
    def vec(seed: Int): Seq[Double] = {
      // deterministic unit-ish vector; seeds far apart are uncorrelated
      val raw = (0 until dim).map(j => math.sin(seed * 37.0 + j * 11.0))
      raw
    }
    def close(v: Seq[Double]): Seq[Double] = v.map(_ * 1.0 + 0.01)

    val vectors = MemoryStream[(Long, Seq[Double], Timestamp)]
    val pairs = graft.operators.Similarity.streamingNearDupPairs(
      vectors.toDF().toDF("vec_id", "embedding", "ts"),
      "vec_id", "embedding", "ts",
      watermarkDelay = "1 minute", intervalSeconds = 600L,
      threshold = 0.95, nPlanes = 4, nTables = 4)
    val query = pairs.writeStream.format("memory")
      .queryName("stream_embdup").outputMode("append").start()
    try {
      // 1 & 2: near-identical vectors 5 min apart → pair.
      // 3: identical to 1 but 2 hours later → outside interval, dropped.
      // 4: unrelated vector at the same time → below threshold, no pair.
      vectors.addData(
        (1L, vec(3), ts(10)),
        (2L, close(vec(3)), ts(15)),
        (3L, vec(3), ts(130)),
        (4L, vec(8), ts(12)))
      query.processAllAvailable()
      // advance the watermark so pending state flushes
      vectors.addData((99L, vec(20), ts(300)))
      query.processAllAvailable()
      val got = spark.table("stream_embdup")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L)), s"got $got")

      // state boundedness: after the ts(300) flush only that one vector's
      // (table × probe + table) rows remain buffered; a far watermark
      // advance must evict it, leaving exactly the two new vectors' rows
      // — broken eviction would read 3× that
      val perVec = query.lastProgress.stateOperators
        .find(_.operatorName.contains("symmetricHashJoin")).get.numRowsTotal
      vectors.addData((100L, vec(21), ts(5000)))
      query.processAllAvailable()
      vectors.addData((101L, vec(22), ts(5001)))
      query.processAllAvailable()
      val joinStateAfter = query.lastProgress.stateOperators
        .find(_.operatorName.contains("symmetricHashJoin")).get.numRowsTotal
      assert(joinStateAfter == 2 * perVec,
        s"join state must hold only live vectors: perVec=$perVec after=$joinStateAfter")
    } finally query.stop()
  }

  test("bucket-keyed near-dup twin matches the join twin and bounds its state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = 8
    def vec(seed: Int): Seq[Double] =
      (0 until dim).map(j => math.sin(seed * 37.0 + j * 11.0))
    def close(v: Seq[Double]): Seq[Double] = v.map(_ + 0.01)

    // same choreography as the join-twin test PLUS a same-batch pair
    // (11, 12) and a cross-batch pair (21 then 22 a trigger later) —
    // the two arrival shapes the group function handles differently
    val data1 = Seq(
      (1L, vec(3), ts(10)), (2L, close(vec(3)), ts(15)),
      (3L, vec(3), ts(130)),
      (4L, vec(8), ts(12)),
      (11L, vec(5), ts(20)), (12L, close(vec(5)), ts(21)),
      // the cross-batch pair sits ABOVE the watermark batch 1 leaves
      // behind (max ts 150 − 1 min delay = 149): 22 @ 152 is on time
      (21L, vec(6), ts(150)))
    val data2 = Seq((22L, close(vec(6)), ts(152)))
    val flush = Seq((99L, vec(20), ts(300)))

    def runTwin(name: String,
                build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : (Set[(Long, Long, Timestamp, Double)], org.apache.spark.sql.streaming.StreamingQuery,
           MemoryStream[(Long, Seq[Double], Timestamp)]) = {
      val vectors = MemoryStream[(Long, Seq[Double], Timestamp)]
      val out = build(vectors.toDF().toDF("vec_id", "embedding", "ts"))
      val query = out.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      vectors.addData(data1: _*); query.processAllAvailable()
      vectors.addData(data2: _*); query.processAllAvailable()
      vectors.addData(flush: _*); query.processAllAvailable()
      val got = spark.table(name)
        .select("id_a", "id_b", "ts_a", "cosine")
        .as[(Long, Long, Timestamp, Double)].collect().toSet
      (got, query, vectors)
    }

    val (joinGot, joinQ, _) = runTwin("twin_join",
      df => graft.operators.Similarity.streamingNearDupPairs(
        df, "vec_id", "embedding", "ts", watermarkDelay = "1 minute",
        intervalSeconds = 600L, threshold = 0.95, nPlanes = 4, nTables = 4))
    joinQ.stop()
    val (bucketGot, bucketQ, bucketStream) = runTwin("twin_bucket",
      df => graft.operators.Similarity.streamingNearDupPairsBucketed(
        df, "vec_id", "embedding", "ts", watermarkDelay = "1 minute",
        intervalSeconds = 600L, threshold = 0.95, nPlanes = 4, nTables = 4).toDF())
    try {
      assert(bucketGot == joinGot,
        s"bucketed twin diverged:\n bucket=$bucketGot\n join=$joinGot")
      assert(bucketGot.map(p => (p._1, p._2)) ==
        Set((1L, 2L), (11L, 12L), (21L, 22L)))
      // state boundedness: after the ts(300) flush only the flush
      // vector's residency rows remain; pushing event time far forward
      // must evict those groups too (timeout), leaving the two new
      // vectors' residencies only
      val perVec = bucketQ.lastProgress.stateOperators
        .find(_.operatorName.contains("flatMapGroupsWithState")).get.numRowsTotal
      bucketStream.addData((100L, vec(21), ts(5000)))
      bucketQ.processAllAvailable()
      bucketStream.addData((101L, vec(22), ts(5001)))
      bucketQ.processAllAvailable()
      val after = bucketQ.lastProgress.stateOperators
        .find(_.operatorName.contains("flatMapGroupsWithState")).get.numRowsTotal
      assert(after <= 2 * perVec,
        s"bucket state must hold only live vectors: perVec=$perVec after=$after")
    } finally bucketQ.stop()
  }
}
