package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = graft.Tables.documents(spark, sfDir)
  private lazy val embeddings = graft.Tables.embeddings(spark, sfDir)

  /** Hand-built MP4 shared by the frame-index and keyframe-sampling
    * tests (one copy, so a layout fix reaches both): an audio trak
    * (must be skipped) plus a video trak with 4 samples in 2 chunks of
    * 2 (single stsc run), sizes 10/12/8/6, stss keyframes 1 and 3, and
    * stts 2×40 + 2×60 ticks over a 1000 tick/s mdhd timescale →
    * pts 0/40/80/140 ms.
    */
  private object Mp4Fixture {
    import java.nio.ByteBuffer
    def be(i: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(i).array()
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be(8 + payload.length) ++ typ.getBytes ++ payload
    val samples: Seq[Array[Byte]] = Seq(
      Array.tabulate[Byte](10)(_.toByte),
      Array.tabulate[Byte](12)(i => (i + 50).toByte),
      Array.tabulate[Byte](8)(i => (i * 3).toByte),
      Array.tabulate[Byte](6)(i => (i + 90).toByte))
    private def stbl(chunkOff: Seq[Int]) = box("stbl",
      box("stsd", be(0) ++ be(1) ++ be(16) ++ "avc1".getBytes ++ Array.fill[Byte](8)(0)) ++
        box("stsz", be(0) ++ be(0) ++ be(4) ++ samples.flatMap(s => be(s.length)).toArray) ++
        box("stsc", be(0) ++ be(1) ++ be(1) ++ be(2) ++ be(0)) ++
        box("stco", be(0) ++ be(chunkOff.length) ++ chunkOff.flatMap(be).toArray) ++
        box("stss", be(0) ++ be(2) ++ be(1) ++ be(3)) ++
        box("stts", be(0) ++ be(2) ++ be(2) ++ be(40) ++ be(2) ++ be(60)))
    private def trak(handler: String, chunkOff: Seq[Int]) = box("trak", box("mdia",
      box("hdlr", be(0) ++ be(0) ++ handler.getBytes ++ Array.fill[Byte](12)(0)) ++
        box("mdhd", be(0) ++ be(0) ++ be(0) ++ be(1000) ++ be(0)) ++
        box("minf", stbl(chunkOff))))
    /** Full file with stco offsets resolved to the real mdat layout. */
    lazy val blob: Array[Byte] = {
      val ftyp = box("ftyp", "isom".getBytes ++ be(512))
      def moov(off: Seq[Int]) =
        box("moov", trak("soun", Seq(0)) ++ trak("vide", off))
      val c0 = ftyp.length + moov(Seq(0, 0)).length + 8
      val c1 = c0 + samples(0).length + samples(1).length
      ftyp ++ moov(Seq(c0, c1)) ++ box("mdat", samples.flatten.toArray)
    }

    /** Fragmented (DASH/fMP4) twin: the same 4 sample payloads delivered
      * via two moof+mdat pairs instead of stbl tables. Exercises every
      * fragment-side rule the walker implements: tfhd default-base-is-
      * moof + default-sample-duration, trex default-sample-flags fallback
      * (fragment 1's second sample has no per-sample or tfhd flags),
      * trun data-offset (moof-relative), a second trun WITHOUT a
      * data-offset continuing at the previous trun's data end, trun
      * first-sample-flags, per-sample flags with the non-sync bit, and
      * tfdt v0/v1 decode times feeding pts.
      */
    lazy val fragBlob: Array[Byte] = {
      val ftyp = box("ftyp", "isom".getBytes ++ be(512))
      val trakV = box("trak",
        // tkhd v0: ver/flags, ctime, mtime, track_ID = 7
        box("tkhd", be(0) ++ be(0) ++ be(0) ++ be(7)) ++
        box("mdia",
          box("hdlr", be(0) ++ be(0) ++ "vide".getBytes ++ Array.fill[Byte](12)(0)) ++
          box("mdhd", be(0) ++ be(0) ++ be(0) ++ be(1000) ++ be(0)) ++
          box("minf", box("stbl",
            box("stsd", be(0) ++ be(1) ++ be(16) ++ "avc1".getBytes ++ Array.fill[Byte](8)(0)) ++
            box("stsz", be(0) ++ be(0) ++ be(0)) ++    // empty: samples come from moofs
            box("stsc", be(0) ++ be(0)) ++
            box("stco", be(0) ++ be(0))))))
      // trex: ver/flags, track_ID, default_sample_description_index,
      // default_sample_duration(0), default_sample_size(0),
      // default_sample_flags = non-sync (the fallback when a fragment
      // sample has no flags of its own)
      val mvex = box("mvex",
        box("trex", be(0) ++ be(7) ++ be(1) ++ be(0) ++ be(0) ++ be(0x10000)))
      val moov = box("moov", trakV ++ mvex)
      // fragment 1: tfhd carries default-base-is-moof (0x20000) +
      // default-sample-duration 40 (0x08); one trun with a data-offset,
      // first-sample-flags sync, per-sample sizes 10 and 12
      def moof1(d: Int) = box("moof",
        box("mfhd", be(0) ++ be(1)) ++
        box("traf",
          box("tfhd", be(0x020008) ++ be(7) ++ be(40)) ++
          box("tfdt", be(0) ++ be(0)) ++
          box("trun", be(0x000205) ++ be(2) ++ be(d) ++ be(0) ++
            be(samples(0).length) ++ be(samples(1).length))))
      // fragment 2: tfdt VERSION 1 (64-bit decode time 80); trun A has a
      // data-offset and per-sample duration/size/flags (sync); trun B
      // has NO data-offset — its sample must continue at trun A's data
      // end — and a non-sync per-sample flag
      def moof2(d: Int) = box("moof",
        box("mfhd", be(0) ++ be(2)) ++
        box("traf",
          box("tfhd", be(0x020000) ++ be(7)) ++
          box("tfdt", be(0x01000000) ++ be(0) ++ be(80)) ++
          box("trun", be(0x000701) ++ be(1) ++ be(d) ++
            be(60) ++ be(samples(2).length) ++ be(0)) ++
          box("trun", be(0x000700) ++ be(1) ++
            be(60) ++ be(samples(3).length) ++ be(0x10000))))
      val d1 = moof1(0).length + 8
      val d2 = moof2(0).length + 8
      ftyp ++ moov ++
        moof1(d1) ++ box("mdat", (samples(0) ++ samples(1)).toArray) ++
        moof2(d2) ++ box("mdat", (samples(2) ++ samples(3)).toArray)
    }

    /** Multi-track fragmented twin: ONE moof holding an AUDIO traf
      * (track 8, sample sizes only via its trex default) followed by a
      * VIDEO traf (track 7) with NO base-data-offset and NO
      * default-base-is-moof — per spec its base is the END of the
      * audio traf's data. Pins that non-video trafs advance the data
      * cursor (via the all-track trex defaults) even though only video
      * trafs emit frames.
      */
    lazy val multiTrackFragBlob: Array[Byte] = {
      val ftyp = box("ftyp", "isom".getBytes ++ be(512))
      val trakV = box("trak",
        box("tkhd", be(0) ++ be(0) ++ be(0) ++ be(7)) ++
        box("mdia",
          box("hdlr", be(0) ++ be(0) ++ "vide".getBytes ++ Array.fill[Byte](12)(0)) ++
          box("mdhd", be(0) ++ be(0) ++ be(0) ++ be(1000) ++ be(0)) ++
          box("minf", box("stbl",
            box("stsd", be(0) ++ be(1) ++ be(16) ++ "avc1".getBytes ++ Array.fill[Byte](8)(0)) ++
            box("stsz", be(0) ++ be(0) ++ be(0)) ++
            box("stsc", be(0) ++ be(0)) ++
            box("stco", be(0) ++ be(0))))))
      // trex: (ver/flags, track_ID, desc_index, duration, size, flags)
      val mvex = box("mvex",
        box("trex", be(0) ++ be(7) ++ be(1) ++ be(40) ++ be(0) ++ be(0)) ++
        box("trex", be(0) ++ be(8) ++ be(1) ++ be(0) ++ be(6) ++ be(0x10000)))
      val moov = box("moov", trakV ++ mvex)
      val audio = Array.tabulate[Byte](12)(i => (i + 7).toByte) // 2 samples × 6 B
      def moofM(d: Int) = box("moof",
        box("mfhd", be(0) ++ be(1)) ++
        box("traf", // audio: tfhd flags 0; trun carries ONLY a data
                    // offset — sizes resolve from track 8's trex default
          box("tfhd", be(0) ++ be(8)) ++
          box("trun", be(0x000001) ++ be(2) ++ be(d))) ++
        box("traf", // video: no base flags → base = end of audio data
          box("tfhd", be(0) ++ be(7)) ++
          box("tfdt", be(0) ++ be(0)) ++
          box("trun", be(0x000200) ++ be(2) ++
            be(samples(0).length) ++ be(samples(1).length))))
      val d = moofM(0).length + 8
      ftyp ++ moov ++ moofM(d) ++
        box("mdat", (audio.toSeq ++ samples(0) ++ samples(1)).toArray)
    }
  }

  test("exact dedup keeps the min-id row per content hash") {
    val withDup = docs.select($"doc_id", $"text")
      .union(docs.select(($"doc_id" + 100000).as("doc_id"), $"text").limit(5))
    val deduped = Dedup.exactDedup(withDup, "text", "doc_id")
    assert(deduped.count() == docs.count())
    assert(deduped.filter($"doc_id" >= 100000).count() == 0)
  }

  test("minhash LSH finds the planted near-duplicate pairs") {
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text",
      numHashes = 32, bands = 8, shingleSize = 2, jaccardThreshold = 0.7).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.7))
    // LSH candidates verified exactly — every reported pair is a true pair
    val exact = Dedup.exactJaccardPairs(docs, "doc_id", "text", 2, 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet.subsetOf(exact))
  }

  test("bucketed range join equals the naive non-equi join") {
    val base = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"ts".cast("long").as("ts_s"))
    val points = base.select($"user_id", $"ts_s")
    val anchors = base.filter($"event_type" === "error")
      .select($"user_id".as("a_user"), $"ts_s".as("a_start"))
      .withColumn("a_end", $"a_start" + 3600L)
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"a_user", $"a_start", $"ts_s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = pairsOf(points.join(anchors,
      points("user_id") === anchors("a_user") &&
        $"ts_s" >= $"a_start" && $"ts_s" < $"a_end"))
    assert(naive.nonEmpty)
    // bucket width smaller than, equal to, and larger than the interval
    for (width <- Seq(600L, 3600L, 10000L)) {
      val bucketed = pairsOf(RangeJoin.pointInInterval(
        points, "user_id", "ts_s", anchors, "a_user", "a_start", "a_end", width))
      assert(bucketed == naive, s"width $width: ${bucketed.size} vs ${naive.size}")
    }
  }

  test("connected components label every node with its component minimum") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 10-11,
    // triangle 20-21-22, and an isolated pair 30-31
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))
      .toDF("id_a", "id_b")
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L)
    // driver-side union-find path (small graph, default threshold)…
    val smallPath = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(smallPath == expected)
    // …and the distributed min-label-propagation path must agree
    val distPath = Dedup.connectedComponents(pairs, "id_a", "id_b",
        driverSideThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distPath == expected)
  }

  test("connected components with non-long ids take the distributed path") {
    val pairs = Seq((1, 2), (2, 3), (10, 11)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == Map(1 -> 1, 2 -> 1, 3 -> 1, 10 -> 10, 11 -> 10))
  }

  test("connected components: per-partition collect-cap overflow falls back to the iterative path correctly") {
    // The single-action fast path (round 15) caps each partition's
    // collected pairs at max(4096, ~2× its proportional threshold
    // share); a partition past the cap returns null and the graph must
    // take the iterative path with IDENTICAL labels. Force it: 5000
    // star edges (0—i, diameter 2 so the iterative loop converges fast)
    // all hashed into ONE partition of a 1000-partition frame →
    // perPartCap = max(4096, 2·(10⁶+1)/1000) = 4096 < 5000, while
    // edgeCount/2 = 5000 stays far under the driver threshold — so
    // ONLY the cap (not the count) rejects the driver-side path.
    val n = 5001
    val pairs = (1L until n).map(i => (0L, i))
      .toDF("id_a", "id_b")
      .repartition(1000, lit(0))
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    assert(got.forall(_._2 == 0L), "every chain node must label to the minimum id 0")
  }

  test("zOrderKey interleaves bits exactly (driver-side replay)") {
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((z, i) =>
        z | ((a & (1L << i)) << i) | ((b & (1L << i)) << (i + 1)))
    val rng = new scala.util.Random(3)
    val samples = Seq((0L, 0L), (4095L, 4095L), (1L, 0L), (0L, 1L)) ++
      Seq.fill(200)((rng.nextInt(4096).toLong, rng.nextInt(4096).toLong))
    val df = samples.toDF("a", "b")
      .withColumn("z", Layout.zOrderKey($"a", $"b", 12))
    df.collect().foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1), 12),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order layout bounds BOTH dimensions per partition; a single-column sort does not") {
    // 64×64 grid → 16 partitions. Under z-order every partition covers a
    // tight rectangle (b-range ≤ 32 here); sorted by `a` alone, every
    // partition spans the FULL b range (63) — the second dimension's
    // min/max stats prune nothing.
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    def maxRangeB(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("p", spark_partition_id())
        .groupBy($"p").agg((max($"b") - min($"b")).as("rb"))
        .agg(max($"rb")).collect().head.getLong(0)
    val zed = Layout.repartitionByZOrder(grid, $"a", $"b", 16, bits = 6)
    val sorted = grid.repartitionByRange(16, $"a")
    val zRange = maxRangeB(zed)
    val sRange = maxRangeB(sorted)
    assert(zRange <= 32, s"z-order partitions must bound b (got range $zRange)")
    assert(sRange == 63, s"the sort-by-a baseline spans all of b (got $sRange)")
  }

  test("content-defined chunks partition the tokens and cut exactly at the hash rule") {
    import org.apache.spark.sql.graft.TextHashOps
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two", "solo", "")
    val df = Chunking.contentDefinedChunks(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text", meanTokens = 4)
    val rows = df.select($"doc_id", $"chunk_idx", $"chunk_hash", $"n_tok")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    // empty doc emits nothing; every other doc's chunks cover all tokens
    assert(!rows.exists(_._1 == 3L))
    for ((t, i) <- texts.zipWithIndex if t.nonEmpty) {
      val toks = t.split(" ")
      val got = rows.filter(_._1 == i.toLong).sortBy(_._2)
      assert(got.map(_._4).sum == toks.length, s"doc $i must partition its tokens")
      // reference segmentation: cut after token p iff fnv64(tok) & 3 == 0
      val expected = {
        val cuts = toks.indices.filter(p =>
          (TextHashOps.fnv64(UTF8String.fromString(toks(p))) & 3L) == 0L)
        val bounds = (-1 +: cuts).zip(cuts :+ (toks.length - 1))
          .map { case (a, b) => (a + 1, b) }.filter { case (a, b) => a <= b }
        bounds.map { case (a, b) =>
          (TextHashOps.fnv64(UTF8String.fromString(
            toks.slice(a, b + 1).mkString(" "))), b - a + 1) }
      }
      assert(got.map(r => (r._3, r._4)).toList == expected.toList, s"doc $i segmentation")
    }
  }

  test("content-defined chunks are shift-resistant: a prepended token leaves later chunks intact") {
    // kappa / nu / omicron / rho cut at mask 3 (fnv64 & 3 == 0), so the
    // base text yields 5 chunks — enough structure for the suffix check
    val base = "alpha beta kappa delta nu zeta omicron theta rho mu"
    val shifted = "junk " + base
    val hashes = (t: String) =>
      Chunking.contentDefinedChunks(Seq((1L, t)).toDF("doc_id", "text"), "text", 4)
        .orderBy($"chunk_idx").select($"chunk_hash").collect().map(_.getLong(0)).toList
    val a = hashes(base)
    val b = hashes(shifted)
    assert(a.size > 2, "test corpus must produce several chunks")
    // everything after the first cut is untouched by the edit
    assert(b.takeRight(a.size - 1) == a.drop(1),
      s"later chunks must survive a front edit: $a vs $b")
  }

  test("content-defined chunks run unchanged on a stream (stateless map-side twin)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq((1L, "alpha beta kappa delta nu zeta"), (2L, "omicron theta rho mu"))
    val input = MemoryStream[(Long, String)]
    val q = Chunking.contentDefinedChunks(
        input.toDF().toDF("doc_id", "text"), "text", meanTokens = 4)
      .writeStream.format("memory").queryName("cdc_stream").outputMode("append").start()
    try {
      input.addData(texts: _*)
      q.processAllAvailable()
      val streamed = spark.table("cdc_stream")
        .select($"doc_id", $"chunk_idx", $"chunk_hash", $"n_tok")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
      val batch = Chunking.contentDefinedChunks(
          texts.toDF("doc_id", "text"), "text", meanTokens = 4)
        .select($"doc_id", $"chunk_idx", $"chunk_hash", $"n_tok")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("bestScoreSurvivors keeps the highest score, min id on ties") {
    // cluster 1: {1,2,3} — best score on the HIGHEST id (3), so min-id
    // selection (q54 semantics) and best-score selection must differ;
    // cluster 10: {10,11} — exact score tie, min id (10) must win
    val members = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.2), (2L, 0.5), (3L, 0.9), (10L, 0.7), (11L, 0.7))
      .toDF("doc_id", "s")
    val got = Dedup.bestScoreSurvivors(members, "doc_id", "cluster_id",
        scores, "doc_id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set((1L, 3L, 3L, 0.9), (10L, 10L, 2L, 0.7)))
  }

  test("bestScoreSurvivors plans ONE cluster-keyed exchange (second Window pass reuses it)") {
    val members = spark.range(1000)
      .select($"id", ($"id" % 100).as("cluster_id"))
    val scores = spark.range(1000)
      .select($"id", ($"id" % 7).cast("double").as("s"))
    val df = Dedup.bestScoreSurvivors(members, "id", "cluster_id", scores, "id", "s")
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    val clusterExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(cluster_id"))
    assert(clusterExchanges == 1,
      s"argmax-with-tiebreak must not re-shuffle between Window passes:\n$plan")
  }

  test("star-contraction components: 1000-node chain converges in O(log n) rounds") {
    // the adversarial case for min-label propagation: a path graph of
    // diameter 1000 would need ~1000 label rounds; alternating
    // large-star/small-star must collapse it logarithmically
    val chain = (0L until 1000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.starContraction(chain, "id_a", "id_b",
      maxIterations = 50)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 1001)
    assert(got.values.forall(_ == 0L), "every chain node labels to the minimum")
    assert(rounds <= 16, s"expected O(log 1000) ≈ ≤16 alternation rounds, used $rounds")
  }

  test("star-contraction components agree with union-find on a mixed graph") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L), (4L, 2L))
      .toDF("id_a", "id_b")
    val expected = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Dedup.connectedComponentsStar(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == expected)
  }

  test("connected components over planted near-dups cover all pair members") {
    val pairs = Dedup.exactJaccardPairs(docs, "doc_id", "text", 2, 0.7)
    val members = pairs.select($"id_a".as("id")).union(pairs.select($"id_b"))
      .distinct().collect().map(_.getLong(0)).toSet
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b").collect()
    assert(cc.map(_.getLong(0)).toSet == members)
    // every cluster id is itself a member and is <= all nodes it labels
    cc.foreach { r => assert(members.contains(r.getLong(1)) && r.getLong(1) <= r.getLong(0)) }
  }

  test("df-ordered prefix: same pairs, strictly fewer candidates on skew") {
    // a stopword-skewed corpus: every doc shares the same hot template
    // phrase; only the tails distinguish them
    // 8 hot template shingles per doc + 6 unique tail shingles: at
    // t=0.7 the prefix (sz − ⌈t·sz⌉ + 1 = 5) fits entirely inside the
    // rare tail once hot shingles sort last
    val template = "the quick brown fox jumps over the lazy dog"
    val skewed = (0 until 60).map(i =>
        (i.toLong, s"$template u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"))
      .toDF("doc_id", "text")
    for (t <- Seq(0.4, 0.7)) {
      val plain = Dedup.exactJaccardPairs(skewed, "doc_id", "text", 2, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val dfOrdered = Dedup.exactJaccardPairs(skewed, "doc_id", "text", 2, t,
          dfOrderHotShingles = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(dfOrdered == plain, s"threshold $t: result sets differ")
    }
    // pruning power: candidate pairs BEFORE verification must shrink
    // when hot shingles are pushed out of the prefixes
    val sh = skewed.select($"doc_id",
        graft.functions.TextFunctions.shingleHashes($"text", 2).as("sh"))
      .withColumn("sz", size($"sh")).filter($"sz" > 0)
    val nPlain = Dedup.jaccardPrefixCandidates(sh, "doc_id", 0.7, 0).count()
    val nOrdered = Dedup.jaccardPrefixCandidates(sh, "doc_id", 0.7, 1000).count()
    assert(nOrdered < nPlain,
      s"df-ordering should prune candidates: $nOrdered vs $nPlain")
    // and on the real corpus the two orders agree too
    val realPlain = Dedup.exactJaccardPairs(docs, "doc_id", "text", 2, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val realOrdered = Dedup.exactJaccardPairs(docs, "doc_id", "text", 2, 0.7,
        dfOrderHotShingles = 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(realOrdered == realPlain)
  }

  test("df-ordered prefix works under ANSI mode (library sessions may not disable it)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.ansi.enabled", "true")
    val im = s2.implicits
    import im._
    val docs2 = Seq((1L, "a b c d e f g"), (2L, "a b c d e f h"),
        (3L, "x y z w v u t")).toDF("doc_id", "text")
    val pairs = Dedup.exactJaccardPairs(docs2, "doc_id", "text", 2, 0.5,
        dfOrderHotShingles = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("prefix-filtered jaccard equals brute-force all-pairs jaccard") {
    // recall proof-by-comparison: the PPJoin-style prefix index must
    // reproduce the O(n²) cross-join answer exactly, pairs AND scores
    val subset = docs.filter($"doc_id" < 120).select($"doc_id", $"text")
    for (t <- Seq(0.3, 0.5, 0.9)) {
      val fast = Dedup.exactJaccardPairs(subset, "doc_id", "text", 2, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = subset.select($"doc_id".as("id_a"), $"text".as("ta"))
        .crossJoin(subset.select($"doc_id".as("id_b"), $"text".as("tb")))
        .filter($"id_a" < $"id_b")
        .withColumn("jaccard", round(Dedup.jaccard($"ta", $"tb", 2), 6))
        .filter($"jaccard" >= t)
        .select($"id_a", $"id_b", $"jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast == brute, s"threshold $t: prefix-join ${fast.size} vs brute ${brute.size}")
    }
  }

  test("containment pairs equal brute-force containment on the bounded slice") {
    val slice = docs.filter($"doc_id" < 500)
    val got = Dedup.containmentPairs(slice, "doc_id", "text", 2, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force: distinct 2-shingle sets, all ordered pairs, C = |A∩B|/|A|
    val sets = slice.select($"doc_id",
        array_distinct(graft.functions.TextFunctions.shingles($"text", 2)).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
      .filter(_._2.nonEmpty)
    val expect = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if sb.size > sa.size || (sb.size == sa.size && ia < ib)
      c = sa.intersect(sb).size.toDouble / sa.size
      if c >= 0.8
    } yield (ia, ib, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(expect.nonEmpty, "test corpus must contain contained documents")
    assert(got == expect)
  }

  test("cross-corpus pairs equal the cross slice of the unified join, no intra pairs") {
    // split the corpus by parity: 'left' is the new crawl, 'right' the
    // existing training set
    val l = docs.filter($"doc_id" % 2 === 0)
    val r = docs.filter($"doc_id" % 2 === 1)
    val got = Dedup.crossCorpusPairs(l, r, "doc_id", "text", 2, 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    // reference: the unified all-pairs join, restricted to cross pairs
    val all = Dedup.exactJaccardPairs(docs, "doc_id", "text", 2, 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    val expect = all.flatMap { case (a, b, j) =>
      if (a % 2 == 0 && b % 2 == 1) Some((a, b, j))
      else if (a % 2 == 1 && b % 2 == 0) Some((b, a, j))
      else None
    }.toSet
    assert(expect.nonEmpty, "corpus must contain cross-parity near-dups")
    assert(got == expect)
    got.foreach { case (a, b, _) => assert(a % 2 == 0 && b % 2 == 1) }
  }

  test("df-ordered containment: same pairs, strictly fewer candidates on skew") {
    // same stopword-skewed corpus shape as the jaccard df-order spec,
    // plus planted containments: short docs embedded in longer ones
    val template = "the quick brown fox jumps over the lazy dog"
    val base = (0 until 40).map(i =>
      (i.toLong, s"$template u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"))
    val contained = (0 until 10).map(i =>
      (100L + i, s"$template u${i}a u${i}b u${i}c u${i}d"))
    val skewed = (base ++ contained).toDF("doc_id", "text")
    val plain = Dedup.containmentPairs(skewed, "doc_id", "text", 2, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(plain.nonEmpty, "planted containments must be found")
    val dfOrdered = Dedup.containmentPairs(skewed, "doc_id", "text", 2, 0.8,
        dfOrderHotShingles = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(dfOrdered == plain, "df-ordering must not change the result")
    val sh = skewed.select($"doc_id",
        graft.functions.TextFunctions.shingleHashes($"text", 2).as("sh"))
      .withColumn("sz", size($"sh")).filter($"sz" > 0)
    val nPlain = Dedup.containmentPrefixCandidates(sh, "doc_id", 0.8, 0).count()
    val nOrdered = Dedup.containmentPrefixCandidates(sh, "doc_id", 0.8, 1000).count()
    assert(nOrdered < nPlain,
      s"df-ordering should prune candidates: $nOrdered vs $nPlain")
  }

  test("containment orientation: the contained side is never the larger set") {
    val got = Dedup.containmentPairs(docs.filter($"doc_id" < 500), "doc_id", "text", 2, 0.8)
    val sizes = docs.filter($"doc_id" < 500)
      .select($"doc_id", size(array_distinct(
        graft.functions.TextFunctions.shingles($"text", 2))).as("sz"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.collect().foreach { r =>
      val (i, o) = (r.getLong(0), r.getLong(1))
      assert(sizes(i) < sizes(o) || (sizes(i) == sizes(o) && i < o))
    }
  }

  test("simhash blocked probes equal brute-force all-pairs at every hamming cutoff") {
    // The blocked 16-bit + 1-bit-flip probing claims EXACT recall for
    // d ≤ 7 (pigeonhole) — assert it against the plain O(n²) self-join
    // on real corpus docs, at the production cutoff and at tighter ones
    // (tighter cutoffs exercise the verify filter, not the probe set).
    val sim = Dedup.simHash(docs.select($"doc_id", $"text"), "text")
      .select($"doc_id", $"simhash").as[(Long, Long)].collect()
    for (d <- Seq(7, 3)) {
      val brute = (for {
        (ia, sa) <- sim; (ib, sb) <- sim
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= d
      } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb))).toSet
      assert(brute.nonEmpty || d < 7) // corpus plants near-dups
      val lsh = Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = d)
        .as[(Long, Long, Int)].collect().toSet
      assert(lsh == brute, s"d=$d: lsh ${lsh.size} vs brute ${brute.size}")
    }
  }

  test("simhash: near-dup docs have close hamming distance") {
    val planted = Dedup.exactJaccardPairs(docs, "doc_id", "text", 2, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(planted.nonEmpty)
    val sim = Dedup.simHash(docs, "text").select($"doc_id", $"simhash")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dupDistances = planted.map { case (a, b) => hamming(sim(a), sim(b)) }
    // near-dups under ~8 bits apart; random pairs average 32
    assert(dupDistances.forall(_ <= 12), s"got ${dupDistances.toSeq}")
  }

  test("native dot product matches the HOF formulation bit-for-bit on clean vectors") {
    import graft.functions.VectorFunctions
    val pairs = embeddings.limit(50).select($"vec_id", $"embedding")
      .crossJoin(embeddings.limit(50).select($"embedding".as("other")))
    val diffs = pairs.select(
        (VectorFunctions.dot($"embedding", $"other") -
          VectorFunctions.dotHof($"embedding", $"other")).as("d"))
      .agg(max(abs($"d"))).collect().head.getDouble(0)
    assert(diffs == 0.0) // same summation order, identical doubles
  }

  test("native dot product propagates NULL for corrupt vectors") {
    import graft.functions.VectorFunctions
    val df = Seq(
      ("ok", Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      ("short", Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0)),
      ("nullelem", Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("kind", "a", "b")
    val out = df.select($"kind", VectorFunctions.dot($"a", $"b").as("d"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("ok").contains(11.0))
    assert(out("short").isEmpty)    // length mismatch → null
    assert(out("nullelem").isEmpty) // null element → null
  }

  test("brute-force KNN ranks are exact and deterministic") {
    val queries = embeddings.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding")
    val topk = Similarity.bruteForceTopK(queries, embeddings, 5).collect()
    assert(topk.length == 10)
    assert(topk.filter(_.getAs[Long]("query_id") == 0L).map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    val cosines = topk.filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
    assert(cosines.sliding(2).forall { case Array(x, y) => x >= y })
  }

  test("LSH KNN returns a subset consistent with brute force scores") {
    val queries = embeddings.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding")
    val approx = Similarity.lshTopK(queries, embeddings, 5, nPlanes = 6).collect()
    assert(approx.nonEmpty)
    assert(approx.forall(r => r.getAs[Double]("cosine") <= 1.0 + 1e-9))
  }

  test("LSH and IVF KNN meet a measured recall@10 floor vs brute force") {
    val queries = embeddings.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, embeddings, 10))
    val lsh = pairs(Similarity.lshTopK(queries, embeddings, 10, nPlanes = 6, nTables = 4))
    val ivf = pairs(Similarity.ivfTopK(queries, embeddings, 10, dim = 64, nProbes = 3))
    def recall(got: Set[(Long, Long)]): Double =
      got.intersect(exact).size.toDouble / exact.size
    info(s"LSH recall@10 = ${recall(lsh)}, IVF recall@10 = ${recall(ivf)}")
    // approximate-by-design, but a recall collapse is a bug, not tuning.
    // OR-amplified multi-table LSH must beat 0.5 even on this
    // neighborless corpus (single-table was 0.09 — the regression this
    // floor guards). IVF's ceiling here is the label quantizer: labels
    // correlate only weakly with proximity, so 3/10 probed cells bounds
    // recall near nProbes/nCells (0.3 if uncorrelated); the floor checks
    // it stays above that chance line.
    assert(recall(lsh) >= 0.5, s"LSH recall@10 = ${recall(lsh)}")
    assert(recall(ivf) >= 0.3, s"IVF recall@10 = ${recall(ivf)}")
  }

  test("IVF over k-means cells: recall beats the label quantizer's chance line") {
    // end-to-end index build: kMeans assigns cells, ivfTopK probes them —
    // a data-driven quantizer should beat cells that only weakly track
    // proximity (the label column), given the same probe budget
    val (assign, _) = Similarity.kMeans(embeddings, "vec_id", "embedding",
      k = 10, dim = 64, iterations = 4)
    val relabeled = embeddings.drop("label")
      .join(assign, "vec_id").withColumnRenamed("cell", "label")
    val queries = embeddings.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, embeddings, 10))
    val ivfKmeans = pairs(Similarity.ivfTopK(queries, relabeled, 10, dim = 64, nProbes = 3))
    val recall = ivfKmeans.intersect(exact).size.toDouble / exact.size
    info(s"IVF-over-kmeans recall@10 = $recall")
    // 3/10 probed cells ⇒ ~0.3 recall if cells were proximity-blind;
    // k-means cells must do materially better than that chance line
    assert(recall >= 0.45, s"IVF-over-kmeans recall@10 = $recall")
  }

  test("IVF auto build: cellsForCorpus dial + kmeans index meets a recall floor") {
    assert(Similarity.cellsForCorpus(0) == 2)
    assert(Similarity.cellsForCorpus(10000) == 100) // √n
    assert(Similarity.probesForCells(100) == 10)    // ⁴√n
    val queries = embeddings.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, embeddings, 10))
    val auto = pairs(Similarity.ivfTopKAuto(queries, embeddings, 10, dim = 64))
    val recall = auto.intersect(exact).size.toDouble / exact.size
    info(s"IVF-auto recall@10 = $recall")
    // the auto dials scan ~nProbes/nCells ≈ ¼ of this corpus; k-means
    // cells must lift recall well above that proximity-blind chance line
    assert(recall >= 0.5, s"IVF-auto recall@10 = $recall")
  }

  test("k-means recovers separable clusters deterministically and feeds IVF") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 3 well-separated clusters around axes e0/e1/e2 in 4-dim, with
    // deterministic per-point jitter on a different axis
    val rows = (0 until 60).map { i =>
      val axis = i % 3
      val v = Array.fill(4)(0.0f)
      v(axis) = 1.0f
      v(3) = 0.05f * ((i % 7) - 3) // jitter, same for every run
      Row(i.toLong, v.toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 5), schema)
    val (assign1, cents) = Similarity.kMeans(df, "vec_id", "embedding",
      k = 3, dim = 4, iterations = 5)
    val byId = assign1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // purity: every point of a true cluster lands in the same cell
    for (axis <- 0 until 3) {
      val cells = (0 until 60).filter(_ % 3 == axis).map(i => byId(i.toLong)).distinct
      assert(cells.size == 1, s"cluster $axis split across cells $cells")
    }
    // the 3 true clusters occupy 3 distinct cells
    assert((0 until 3).map(a => byId(a.toLong)).distinct.size == 3)
    // each centroid points at its cluster's axis
    cents.foreach { c =>
      val main = c.zipWithIndex.maxBy(x => math.abs(x._1))._2
      assert(main < 3 && math.abs(c(main)) > 0.9)
    }
    // determinism: a second run reproduces the assignment exactly
    val (assign2, _) = Similarity.kMeans(df, "vec_id", "embedding",
      k = 3, dim = 4, iterations = 5)
    assert(assign2.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap == byId)
  }

  test("IVF ANN: probed-cell search returns valid ranked neighbors") {
    val queries = embeddings.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding")
    val ivf = Similarity.ivfTopK(queries, embeddings, 5, dim = 64, nProbes = 10)
    val rows = ivf.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 5))
    // with all cells probed, IVF degrades to exact — top-1 must match brute force
    val brute = Similarity.bruteForceTopK(queries, embeddings, 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val ivfTop1 = rows.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    assert(ivfTop1 == brute)
  }

  test("embedding near-dup: LSH pairs are a subset of exact pairs") {
    val exact = Similarity.cosinePairsExact(embeddings, 0.35)
      .as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineNearDupLsh(embeddings, 0.35, nPlanes = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
  }

  test("embedding near-dup: sliced bucket join emits the same pairs as unsliced") {
    // The parallelism guard slices the bucket join when the key space
    // (nTables·2^nPlanes) is small relative to shuffle parallelism — the
    // hand-dial-at-big-corpus regime where the join is otherwise bound to
    // one core per bucket. Slicing must be invisible in the result: every
    // pair still meets exactly once, at the build side's hash slice.
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    // keySpace = 1·2^2 = 4: at 4 partitions slices = 4·4/4 = 4 (active);
    // at 1 partition slices = 4/4 = 1 (plain single-key join)
    val sliced = Similarity.cosineNearDupLsh(embeddings, 0.35, nPlanes = 2,
      nTables = 1).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val unsliced = try
      Similarity.cosineNearDupLsh(embeddings, 0.35, nPlanes = 2, nTables = 1)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    finally spark.conf.set("spark.sql.shuffle.partitions", conf)
    assert(sliced == unsliced)
    assert(sliced.nonEmpty)
  }

  test("embedding near-dup: auto plane count scales buckets with the corpus") {
    // the formula reproduces the hand-tuned configs at both measured
    // scales: 2k vectors → 4 planes (q28's pinned dial), 20k → 8 planes
    // (the 10×-scale-smoke fix — SCALING.md "ANN/LSH at scale")
    assert(Similarity.planesForCorpus(2000) == 4)
    assert(Similarity.planesForCorpus(20000) == 8)
    assert(Similarity.planesForCorpus(1000000) == 13)
    assert(Similarity.planesForCorpus(10) == 2) // floor
    // exact power-of-two corpus sizes — the cases where the old libm
    // CEIL(LN/LN) form sat within 1 ulp of an integer and could diverge
    // between engines; the integer formula pins the boundary
    assert(Similarity.planesForCorpus(128L << 10) == 10) // n/128 == 2^10 exactly
    assert(Similarity.planesForCorpus((128L << 10) + 1) == 11)
    assert(Similarity.planesForCorpus(512) == 2)
    assert(Similarity.planesForCorpus(513) == 3)
    // recall: plant true near-dup pairs (cosine ≥ 0.95) and require the
    // auto config to find them all — OR-amplified tables + multi-probe
    // must repair what the longer per-table hash costs
    val base = embeddings.limit(200)
      .select($"vec_id", $"embedding")
    val planted = base.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"embedding", x => x * lit(1.0) + lit(0.001)).as("embedding"))
    val corpus = base.union(planted)
    val found = Similarity.cosineNearDupLshAuto(corpus, 0.95, nTables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = base.select($"vec_id").as[Long].collect()
      .map(id => (id, id + 100000L)).toSet
    assert(expected.subsetOf(found))
    // and everything reported really clears the threshold (exact verify)
    val exact = Similarity.cosinePairsExact(corpus, 0.95)
      .as[(Long, Long)].collect().toSet
    assert(found.subsetOf(exact))
  }

  test("embedding near-dup: ids-only layout emits exactly the vector-carrying pairs") {
    // same candidate rule, different bytes routing — the pair set (and
    // the rounded cosines) must be identical, which is what lets the
    // auto path switch layouts purely on byte estimates
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().toSet
    val vec = asSet(Similarity.cosineNearDupLsh(embeddings, 0.35, nPlanes = 4, nTables = 2))
    val ids = asSet(Similarity.cosineNearDupLshIdsOnly(embeddings, 0.35, nPlanes = 4, nTables = 2))
    assert(vec == ids)
    assert(vec.nonEmpty)
  }

  test("LSH shuffle budget: table count derives from the byte estimate") {
    // the measured round-10 death: n=2M, dim=64, 14 planes — 4 tables
    // estimate ~70 GB (> the 48 GB default budget, and indeed > the
    // node's free disk when it died); the derivation lands on 2 tables,
    // the config that completed at 45 GB peak (SCALING.md)
    val n = 2000000L
    val np = Similarity.planesForCorpus(n) // 14
    assert(np == 14)
    assert(Similarity.lshProbeExchangeBytes(n, 64, np, 4) > Similarity.DefaultLshShuffleBudgetBytes)
    assert(Similarity.tablesForShuffleBudget(n, 64, np, 4,
      Similarity.DefaultLshShuffleBudgetBytes) == 2)
    // a roomy budget keeps the requested dial
    assert(Similarity.tablesForShuffleBudget(n, 64, np, 4, 1L << 40) == 4)
    // floor at 1 even when nothing fits
    assert(Similarity.tablesForShuffleBudget(n, 64, np, 4, 1L) == 1)
    // the dim ≫ bucketSize regime: at 768 dims the ids-only layout
    // estimates cheaper than vector-carrying (the auto path's step-2/3
    // dispatch), while at 64 dims vector-carrying wins
    assert(Similarity.lshIdsOnlyExchangeBytes(n, np, 4, 128) <
      Similarity.lshProbeExchangeBytes(n, 768, np, 4))
    assert(Similarity.lshProbeExchangeBytes(n, 64, np, 4) <
      Similarity.lshIdsOnlyExchangeBytes(n, np, 4, 128))
  }

  test("LSH auto budget dispatch: every branch emits the same pairs on a small corpus") {
    // bucketSize 8 puts this corpus in the ids-only-cheaper regime
    // (dim 64 > bucket 8), so all three dispatch steps are reachable
    def pairs(budget: Long) =
      Similarity.cosineNearDupLshAuto(embeddings, 0.35, targetBucketSize = 8,
          shuffleByteBudget = budget)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val n = embeddings.count()
    val np = Similarity.planesForCorpus(n, 8)
    val vecBytes = Similarity.lshProbeExchangeBytes(n, 64, np, 4)
    assert(Similarity.lshIdsOnlyExchangeBytes(n, np, 4, 8) < vecBytes)
    val roomy = pairs(vecBytes)          // step 1: vector-carrying
    val idsOnly = pairs(vecBytes - 1)    // step 2: ids-only, same tables
    val clamped = pairs(1L)              // step 3: clamped ids-only tables
    assert(roomy == idsOnly)
    assert(roomy.nonEmpty)
    // clamped tables lose OR-amplification, never invent pairs
    assert(clamped.subsetOf(roomy))
  }

  test("media decode: mapPartitions metadata with deterministic stub") {
    val media = Media.attachBlob(docs)
    val meta = Media.decodeMetadata(media).collect()
    assert(meta.length == docs.count())
    assert(meta.forall(m => m.width % 64 == 0 && m.height % 64 == 0))
    assert(meta.forall(m => Set("png", "jpeg", "webp").contains(m.format)))
    val one = meta.head
    assert(one.width == 64 * (1 + one.n_bytes % 16))
  }

  test("media decode: real PNG/JPEG/GIF/BMP bytes through the same mapPartitions path") {
    // real images generated in-JVM (BufferedImage + ImageIO.write): the
    // decoder must recover true dimensions via the header-only
    // javax.imageio path, through the identical Spark plan the stub uses
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
      out.toByteArray
    }
    val blobs = Seq(
      (1L, imageBytes("png", 640, 480), "png", 640, 480),
      (2L, imageBytes("jpg", 320, 200), "jpeg", 320, 200),
      (3L, imageBytes("gif", 64, 32), "gif", 64, 32),
      (4L, imageBytes("bmp", 17, 23), "bmp", 17, 23))
    val df = blobs.map { case (id, b, _, _, _) => (id, b) }
      .toDF("doc_id", "blob")
    val meta = Media.decodeMetadata(df).collect().map(m => m.doc_id -> m).toMap
    blobs.foreach { case (id, b, fmt, w, h) =>
      assert(meta(id).format == fmt)
      assert(meta(id).width == w, s"width of $fmt")
      assert(meta(id).height == h, s"height of $fmt")
      assert(meta(id).n_bytes == b.length.toLong)
    }
    // corrupt stream (image magic, garbage body) falls back to the
    // deterministic stub instead of failing the task — lenient parse
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3)
    val fallback = Media.decodeMetadata(
      Seq((9L, corrupt)).toDF("doc_id", "blob")).collect().head
    assert(fallback.width == 64 * (1 + corrupt.length % 16))
    // non-image payloads never reach ImageIO (sniff returns None)
    assert(Media.sniffFormat("just some text".getBytes).isEmpty)
  }

  test("media decode: real WAV/AIFF bytes yield true sample rate, channels, duration") {
    // genuine audio containers generated in-JVM (AudioSystem.write over
    // synthesized PCM): the decoder must recover the real header fields
    // via javax.sound.sampled, through the same mapPartitions path
    def audioBytes(fileType: javax.sound.sampled.AudioFileFormat.Type,
                   rateHz: Float, channels: Int, frames: Int): Array[Byte] = {
      import javax.sound.sampled._
      val fmt = new AudioFormat(rateHz, 16, channels, true, false)
      val pcm = Array.tabulate(frames * channels * 2)(i => (i * 37 % 251).toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, fileType, out)
      out.toByteArray
    }
    import javax.sound.sampled.AudioFileFormat.Type
    val blobs = Seq(
      // 8000 Hz mono, 1600 frames → 200 ms; 44100 Hz stereo, 4410 → 100 ms
      (1L, audioBytes(Type.WAVE, 8000f, 1, 1600), "wav", 8000, 1, 200L),
      (2L, audioBytes(Type.WAVE, 44100f, 2, 4410), "wav", 44100, 2, 100L),
      (3L, audioBytes(Type.AIFF, 16000f, 1, 8000), "aiff", 16000, 1, 500L))
    val df = blobs.map { case (id, b, _, _, _, _) => (id, b) }
      .toDF("doc_id", "blob")
    val meta = Media.decodeMetadata(df).collect().map(m => m.doc_id -> m).toMap
    blobs.foreach { case (id, b, fmt, rate, ch, durMs) =>
      assert(meta(id).format == fmt)
      assert(meta(id).sample_rate.contains(rate), s"rate of $fmt")
      assert(meta(id).channels.contains(ch), s"channels of $fmt")
      assert(meta(id).duration_ms.contains(durMs), s"duration of $fmt")
      assert(meta(id).n_bytes == b.length.toLong)
      assert(meta(id).width == 0 && meta(id).height == 0)
    }
    // truncated container (RIFF/WAVE magic, body cut) falls back to the
    // deterministic stub instead of failing the task — lenient parse
    val corrupt = blobs.head._2.take(16)
    val fallback = Media.decodeMetadata(
      Seq((9L, corrupt)).toDF("doc_id", "blob")).collect().head
    assert(fallback.sample_rate.isEmpty)
    assert(fallback.width == 64 * (1 + corrupt.length % 16))
    // image decodes leave the audio fields empty
    assert(Media.sniffFormat("RIFFxxxxWAVE".getBytes).contains("wav"))
    assert(Media.sniffFormat("FORMxxxxAIFF".getBytes).contains("aiff"))
    assert(Media.sniffFormat("RIFFxxxxAVI ".getBytes).contains("avi"))
  }

  test("chunking: overlapping windows cover every char and reconstruct the text") {
    val samples = Seq(
      (1L, "a" * 73 + "b" * 1161), // 1234 chars: 3 chunks, ragged tail
      (2L, "short"), // shorter than one chunk
      (3L, "x" * 500), // exactly one chunk
      (4L, "y" * 900)) // exactly len = chunk + step boundary
      .toDF("doc_id", "text")
    val out = Chunking.chunk(samples, "text", chunkChars = 500, overlapChars = 100)
      .select($"doc_id", $"chunk_index", $"chunk_start", $"chunk_text")
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).toList).toMap
    val texts = samples.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val chunks = out(id)
      // offsets follow i*step; every non-final chunk is full-size
      chunks.zipWithIndex.foreach { case (c, i) =>
        assert(c.getInt(1) == i && c.getLong(2) == i * 400L)
      }
      chunks.init.foreach(c => assert(c.getString(3).length == 500))
      // consecutive chunks share exactly the overlap
      chunks.sliding(2).foreach {
        case List(a, b) =>
          assert(a.getString(3).takeRight(100) == b.getString(3).take(100))
        case _ => ()
      }
      // reconstruction: head + tails-without-overlap == original text
      val rebuilt = chunks.head.getString(3) +
        chunks.tail.map(_.getString(3).drop(100)).mkString
      assert(rebuilt == text, s"doc $id reconstruction")
    }
    assert(out(2L).size == 1 && out(3L).size == 1)
    assert(out(4L).size == 2) // 900 = 500 + 400: second chunk ends flush
  }

  test("chunking runs unchanged on a stream (stateless, no watermark needed)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val chunked = Chunking.chunk(
        input.toDF().toDF("doc_id", "text"), "text", 500, 100)
      .select($"doc_id", $"chunk_index", length($"chunk_text").as("n"))
    val q = chunked.writeStream.format("memory")
      .queryName("chunk_stream").outputMode("append").start()
    try {
      input.addData((1L, "x" * 1234), (2L, "short"))
      q.processAllAvailable()
      val rows = spark.table("chunk_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(rows == Set((1L, 0, 500), (1L, 1, 500), (1L, 2, 434), (2L, 0, 5)))
    } finally q.stop()
  }

  test("frame routing runs unchanged on a stream (stateless, append mode)") {
    // ingest-time media indexing: a streaming media pipeline routes
    // frames as blobs ARRIVE — frameChunkIndex/sampleKeyframes are
    // stateless map-side flatMaps, so they lift to streaming with no
    // watermark or state store
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val payload = Array.tabulate[Byte](90)(i => (i * 5).toByte)
    val avi = Media.wrapAvi(payload) // 3 dc frames, frame 0 keyframed
    val input = MemoryStream[(Long, Array[Byte])]
    val indexed = Media.frameChunkIndex(input.toDF().toDF("doc_id", "blob"))
    val q = indexed.writeStream.format("memory")
      .queryName("frame_stream").outputMode("append").start()
    try {
      input.addData((1L, avi), (2L, "not a container".getBytes))
      q.processAllAvailable()
      val rows = spark.table("frame_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(5)))
      assert(rows.count(_._1 == 1L) == 3 && !rows.exists(_._1 == 2L))
      // offsets live in the streamed rows exactly as in batch
      val batch = Media.frameChunkIndex(Seq((1L, avi)).toDF("doc_id", "blob"))
        .collect().map(c => (c.doc_id, c.frame_index, c.size))
      assert(rows.filter(_._1 == 1L).sortBy(_._2).toSeq == batch.sortBy(_._2).toSeq)
    } finally q.stop()
  }

  test("media decode: MP4 box tree and AVI header yield real video metadata") {
    // minimal-but-valid containers built byte-by-byte: the parser must
    // recover duration from moov/mvhd, dimensions from the first VIDEO
    // trak (skipping the 0x0 audio trak), and the avih fields — all
    // without any codec
    import java.nio.ByteBuffer
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      ByteBuffer.allocate(payload.length + 8)
        .putInt(payload.length + 8).put(typ.getBytes("ISO-8859-1"))
        .put(payload).array()
    val mvhd = { // v0: timescale 600 @12, duration 3000 ticks @16 → 5 s
      val b = ByteBuffer.allocate(100)
      b.position(12); b.putInt(600); b.putInt(3000); b.array()
    }
    def tkhd(w: Int, h: Int) = { // v0: 16.16 width @76, height @80
      val b = ByteBuffer.allocate(84)
      b.position(76); b.putInt(w << 16); b.putInt(h << 16); b.array()
    }
    val mp4 = box("ftyp", "isomisom".getBytes) ++
      box("moov", box("mvhd", mvhd) ++
        box("trak", box("tkhd", tkhd(0, 0))) ++ // audio trak: 0×0
        box("trak", box("tkhd", tkhd(640, 360)))) ++
      box("mdat", Array.fill[Byte](32)(7))
    def le(i: Int) = ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    val avih = { // 33333 µs/frame, 300 frames @16, 320×240 @32/@36
      val b = ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(33333); b.position(16); b.putInt(300)
      b.position(32); b.putInt(320); b.putInt(240); b.array()
    }
    val hdrl = "LIST".getBytes ++ le(4 + 8 + avih.length) ++ "hdrl".getBytes ++
      "avih".getBytes ++ le(avih.length) ++ avih
    val avi = "RIFF".getBytes ++ le(4 + hdrl.length) ++ "AVI ".getBytes ++ hdrl
    assert(Media.sniffFormat(mp4).contains("mp4"))
    assert(Media.sniffFormat(avi).contains("avi"))
    val meta = Media.decodeMetadata(
        Seq((1L, mp4), (2L, avi)).toDF("doc_id", "blob"))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).format == "mp4")
    assert(meta(1L).width == 640 && meta(1L).height == 360)
    assert(meta(1L).duration_ms.contains(5000L))
    assert(meta(2L).format == "avi")
    assert(meta(2L).width == 320 && meta(2L).height == 240)
    assert(meta(2L).duration_ms.contains(9999L)) // 300 × 33333 µs
    assert(meta.values.forall(m => m.sample_rate.isEmpty && m.channels.isEmpty))
    // truncated moov (magic intact, tree cut) falls back to the stub
    val corrupt = mp4.take(20)
    val fb = Media.decodeMetadata(Seq((9L, corrupt)).toDF("doc_id", "blob"))
      .collect().head
    assert(fb.duration_ms.isEmpty && fb.width == 64 * (1 + corrupt.length % 16))
  }

  test("uncompressed AVI movi chunks decode to real frames; compressed falls back to stub") {
    import java.nio.ByteBuffer
    def le(i: Int) = ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    def chunk(ck: String, payload: Array[Byte]): Array[Byte] =
      ck.getBytes ++ le(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      "LIST".getBytes ++ le(4 + body.length) ++ listType.getBytes ++ body
    def riffAvi(body: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ le(4 + body.length) ++ "AVI ".getBytes ++ body
    // three known DIB frames, one odd-sized (exercises even padding),
    // one inside a 'rec ' grouping list (interleaved-AVI shape)
    val f0 = Array.tabulate[Byte](16)(i => i.toByte)
    val f1 = Array.tabulate[Byte](15)(i => (i + 100).toByte)
    val f2 = Array.tabulate[Byte](8)(i => (i * 3).toByte)
    val audio = Array.fill[Byte](12)(0x55) // '01wb' audio chunk: skipped
    val uncompressed = riffAvi(list("movi",
      chunk("00db", f0) ++ chunk("01wb", audio) ++ chunk("00db", f1) ++
        list("rec ", chunk("00db", f2))))
    val compressed = riffAvi(list("movi", chunk("00dc", f0) ++ chunk("00dc", f1)))
    assert(Media.sniffFormat(uncompressed).contains("avi"))
    val frames = Media.sampleFrames(
        Seq((1L, uncompressed), (2L, compressed)).toDF("doc_id", "blob"),
        frameBytes = 7)
      .collect().groupBy(_.doc_id)
    // real frames: exact bytes, stream order, audio chunk skipped
    val real = frames(1L).sortBy(_.frame_index)
    assert(real.length == 3)
    assert(real(0).frame_bytes.toSeq == f0.toSeq)
    assert(real(1).frame_bytes.toSeq == f1.toSeq)
    assert(real(2).frame_bytes.toSeq == f2.toSeq)
    // compressed codec: no JDK decode exists — documented stub slicing
    assert(frames(2L).length == math.ceil(compressed.length / 7.0).toInt)
    assert(frames(2L).sortBy(_.frame_index).flatMap(_.frame_bytes).toSeq
      == compressed.toSeq)
  }

  test("frame-chunk index locates compressed frames byte-exactly with idx1 keyframe flags") {
    import java.nio.ByteBuffer
    def le(i: Int) = ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    def chunk(ck: String, payload: Array[Byte]): Array[Byte] =
      ck.getBytes ++ le(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      "LIST".getBytes ++ le(4 + body.length) ++ listType.getBytes ++ body
    def riffAvi(body: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ le(4 + body.length) ++ "AVI ".getBytes ++ body
    // compressed stream 0: keyframe f0, delta f1 (odd size: padding),
    // delta f2 inside a 'rec ' grouping list; interleaved audio skipped
    val f0 = Array.tabulate[Byte](24)(i => i.toByte)
    val f1 = Array.tabulate[Byte](15)(i => (i + 100).toByte)
    val f2 = Array.tabulate[Byte](10)(i => (i * 7).toByte)
    val audio = Array.fill[Byte](12)(0x55)
    val movi = list("movi",
      chunk("00dc", f0) ++ chunk("01wb", audio) ++ chunk("00dc", f1) ++
        list("rec ", chunk("00dc", f2)))
    // idx1 AVIOLDINDEX: flags 0x10 = AVIIF_KEYFRAME; offsets deliberately
    // written in the movi-relative base the matcher must NOT depend on
    def idxEntry(ck: String, flags: Int) =
      ck.getBytes ++ le(flags) ++ le(0) ++ le(0)
    val idx1 = chunk("idx1",
      idxEntry("00dc", 0x10) ++ idxEntry("01wb", 0) ++
        idxEntry("00dc", 0) ++ idxEntry("00dc", 0))
    val withIdx = riffAvi(movi ++ idx1)
    val noIdxDb = riffAvi(list("movi", chunk("00db", f0)))
    val noIdxDc = riffAvi(list("movi", chunk("00dc", f0)))
    val notAvi = "plain text, not a container".getBytes

    val rows = Media.frameChunkIndex(
        Seq((1L, withIdx), (2L, noIdxDb), (3L, noIdxDc), (4L, notAvi))
          .toDF("doc_id", "blob"))
      .collect().groupBy(_.doc_id)

    val v = rows(1L).sortBy(_.frame_index)
    assert(v.length == 3) // audio chunk excluded
    assert(v.forall(c => c.stream_id == 0 && c.codec_kind == "dc"))
    // offsets are absolute into the blob: slicing recovers frame bytes
    // exactly — the contract an external decoder relies on
    def slice(b: Array[Byte], c: Media.FrameChunk) =
      b.slice(c.offset.toInt, (c.offset + c.size).toInt).toSeq
    assert(slice(withIdx, v(0)) == f0.toSeq)
    assert(slice(withIdx, v(1)) == f1.toSeq)
    assert(slice(withIdx, v(2)) == f2.toSeq)
    assert(v.map(_.keyframe) sameElements
      Array(Some(true), Some(false), Some(false)))
    // no idx1: uncompressed DIB frames are self-contained keyframes;
    // compressed without an index is honestly unknown
    assert(rows(2L).head.keyframe == Some(true))
    assert(rows(2L).head.codec_kind == "db")
    assert(rows(3L).head.keyframe.isEmpty)
    assert(!rows.contains(4L)) // non-AVI blobs emit nothing
    // no avih header anywhere above → timing honestly unknown
    assert(v.forall(_.pts_ms.isEmpty))

    // with an avih header (33333 µs/frame): pts = index × µs/frame
    val avih = { // dwMicroSecPerFrame at offset 0
      val a = Array.fill[Byte](56)(0)
      le(33333).copyToArray(a, 0); a
    }
    val hdrl = list("hdrl", chunk("avih", avih))
    val timed = riffAvi(hdrl ++ movi ++ idx1)
    val tRows = Media.frameChunkIndex(Seq((9L, timed)).toDF("doc_id", "blob"))
      .collect().sortBy(_.frame_index)
    assert(tRows.map(_.pts_ms).toSeq == Seq(Some(0L), Some(33L), Some(66L)))
    assert(tRows.map(_.keyframe).toSeq ==
      Seq(Some(true), Some(false), Some(false))) // idx1 still applies
  }

  test("mp4 frame-chunk index resolves stbl sample tables to absolute offsets") {
    // 4 video samples in 2 chunks of 2 (stsc run table has ONE entry
    // covering both chunks); sizes vary so per-sample offsets must
    // accumulate within a chunk; stss marks samples 1 and 3 as sync;
    // the audio trak must be skipped without consuming stream ids
    val samples = Mp4Fixture.samples
    val blob = Mp4Fixture.blob
    assert(Media.sniffFormat(blob).contains("mp4"))

    val rows = Media.frameChunkIndex(Seq((1L, blob)).toDF("doc_id", "blob"))
      .collect().sortBy(_.frame_index)
    assert(rows.length == 4)
    assert(rows.forall(c => c.stream_id == 0 && c.codec_kind == "avc1"))
    def slice(c: Media.FrameChunk) =
      blob.slice(c.offset.toInt, (c.offset + c.size).toInt).toSeq
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(slice(rows(i)) == s.toSeq, s"sample $i bytes")
    }
    assert(rows.map(_.keyframe).toSeq ==
      Seq(Some(true), Some(false), Some(true), Some(false)))
    // stts cumulative ticks (0, 40, 80, 140) over the 1000-tick/s
    // mdhd timescale = milliseconds directly
    assert(rows.map(_.pts_ms).toSeq ==
      Seq(Some(0L), Some(40L), Some(80L), Some(140L)))
  }

  test("fragmented mp4 (moof/trun): index resolves fragment runs byte-exactly") {
    val samples = Mp4Fixture.samples
    val blob = Mp4Fixture.fragBlob
    assert(Media.sniffFormat(blob).contains("mp4"))
    val rows = Media.frameChunkIndex(Seq((1L, blob)).toDF("doc_id", "blob"))
      .collect().sortBy(_.frame_index)
    assert(rows.length == 4, s"expected 4 fragment samples, got ${rows.toSeq}")
    assert(rows.forall(c => c.stream_id == 0 && c.codec_kind == "avc1"))
    // byte-exact: every chunk location slices the original payload
    def slice(c: Media.FrameChunk) =
      blob.slice(c.offset.toInt, (c.offset + c.size).toInt).toSeq
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(slice(rows(i)) == s.toSeq, s"fragment sample $i bytes")
    }
    // keyframes: trun first-sample-flags (sync), trex default (non-sync),
    // per-sample sync, per-sample non-sync
    assert(rows.map(_.keyframe).toSeq ==
      Seq(Some(true), Some(false), Some(true), Some(false)))
    // pts: tfdt 0 + default duration 40, then tfdt(v1) 80 + trun
    // duration 60 — over the 1000-tick/s mdhd timescale
    assert(rows.map(_.pts_ms).toSeq ==
      Seq(Some(0L), Some(40L), Some(80L), Some(140L)))
    // keyframe sampling rides the fragment index the same as stbl files
    val sampled = Media.sampleKeyframes(
        Seq((1L, blob)).toDF("doc_id", "blob"), everyMs = 50L)
      .collect().sortBy(_.frame_index)
    assert(sampled.map(_.frame_bytes.toSeq).toSeq ==
      Seq(samples(0).toSeq, samples(2).toSeq))
    // truncation: cutting mid-mdat drops exactly the out-of-bounds
    // locations (correct-by-refusal, not zero-padding)
    val cut = java.util.Arrays.copyOf(blob, blob.length - 8)
    val cutRows = Media.frameChunkIndex(Seq((2L, cut)).toDF("doc_id", "blob"))
      .collect()
    assert(cutRows.forall(c => c.offset + c.size <= cut.length))
    assert(cutRows.length == 2, s"8-byte cut clips sample 4 and sample 3")
  }

  test("fragmented mp4: a non-video traf advances the data cursor for the traf after it") {
    val samples = Mp4Fixture.samples
    val blob = Mp4Fixture.multiTrackFragBlob
    val rows = Media.frameChunkIndex(Seq((1L, blob)).toDF("doc_id", "blob"))
      .collect().sortBy(_.frame_index)
    assert(rows.length == 2, s"only the video traf emits frames: ${rows.toSeq}")
    def slice(c: Media.FrameChunk) =
      blob.slice(c.offset.toInt, (c.offset + c.size).toInt).toSeq
    // byte-exact only if the audio traf's trex-default-sized run moved
    // the implicit base: a cursor stuck at moofStart would slice moof
    // header / audio bytes here
    assert(slice(rows(0)) == samples(0).toSeq && slice(rows(1)) == samples(1).toSeq,
      "video offsets must start at the END of the audio traf's data")
  }

  test("keyframe sampling picks one keyframe per interval and slices its bytes") {
    // shared fixture: keyframes 1 and 3 (stss), pts 0/40/80/140 ms
    val samples = Mp4Fixture.samples
    val blob = Mp4Fixture.blob

    // 50 ms interval: keyframes at 0 and 80 ms are both >= the next-due
    // mark; sliced bytes are the exact sample payloads
    val wide = Media.sampleKeyframes(
        Seq((1L, blob)).toDF("doc_id", "blob"), everyMs = 50L)
      .collect().sortBy(_.frame_index)
    assert(wide.map(_.frame_bytes.toSeq).toSeq ==
      Seq(samples(0).toSeq, samples(2).toSeq))
    // 100 ms interval: the 80 ms keyframe falls inside the window
    val narrow = Media.sampleKeyframes(
        Seq((1L, blob)).toDF("doc_id", "blob"), everyMs = 100L)
      .collect()
    assert(narrow.map(_.frame_bytes.toSeq).toSeq == Seq(samples(0).toSeq))
    // non-container blobs yield nothing (routing is container-only)
    assert(Media.sampleKeyframes(
      Seq((2L, "not a container".getBytes)).toDF("doc_id", "blob"))
      .collect().isEmpty)
  }

  test("multi-stream containers: per-stream numbering, sampling, and bounds") {
    import java.nio.ByteBuffer
    def le(i: Int) = ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    def chunk(ck: String, payload: Array[Byte]): Array[Byte] =
      ck.getBytes ++ le(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      "LIST".getBytes ++ le(4 + body.length) ++ listType.getBytes ++ body
    def riffAvi(body: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ le(4 + body.length) ++ "AVI ".getBytes ++ body
    val f = Array.tabulate[Byte](10)(_.toByte)
    val avih = { val a = Array.fill[Byte](56)(0); le(33333).copyToArray(a, 0); a }
    // interleaved two-stream AVI: 00dc/01dc alternate; idx1 keys all four
    def idxEntry(ck: String) = ck.getBytes ++ le(0x10) ++ le(0) ++ le(0)
    val multi = riffAvi(
      list("hdrl", chunk("avih", avih)) ++
        list("movi", chunk("00dc", f) ++ chunk("01dc", f) ++
          chunk("00dc", f) ++ chunk("01dc", f)) ++
        chunk("idx1", idxEntry("00dc") ++ idxEntry("01dc") ++
          idxEntry("00dc") ++ idxEntry("01dc")))
    val byStream = Media.frameChunkIndex(Seq((1L, multi)).toDF("doc_id", "blob"))
      .collect().groupBy(_.stream_id)
    // frame_index and pts count within each stream, not globally: a
    // global counter would give stream 1 indices 1,3 and doubled pts
    Seq(0, 1).foreach { sid =>
      val s = byStream(sid).sortBy(_.frame_index)
      assert(s.map(_.frame_index).toSeq == Seq(0, 1), s"stream $sid indices")
      assert(s.map(_.pts_ms).toSeq == Seq(Some(0L), Some(33L)), s"stream $sid pts")
    }
    // interval sampling keeps an independent cursor per stream: a huge
    // interval yields ONE keyframe per stream, not one per container
    val sampled = Media.sampleKeyframes(
        Seq((1L, multi)).toDF("doc_id", "blob"), everyMs = 60000L)
      .collect()
    assert(sampled.length == 2, s"one keyframe per stream, got ${sampled.length}")

    // MP4 truncated mid-mdat: stco/stsz point past the cut — the index
    // must emit only locations a slice can honor (no zero-padding, no
    // throw), and sampling over the truncated blob must not crash
    val blob = Mp4Fixture.blob
    val cut = java.util.Arrays.copyOf(blob, blob.length - 10)
    val cutIdx = Media.frameChunkIndex(Seq((2L, cut)).toDF("doc_id", "blob"))
      .collect()
    assert(cutIdx.forall(c => c.offset + c.size <= cut.length))
    // the 10-byte cut swallows the 6-byte sample 4 whole and clips 4
    // bytes off sample 3 — both must drop (a clipped slice would be
    // wrong bytes, not a shorter frame)
    assert(cutIdx.length == 2)
    Media.sampleKeyframes(Seq((2L, cut)).toDF("doc_id", "blob"), everyMs = 1L)
      .collect() // must not throw
  }

  test("image dHash: decode→downscale→gradient bits, stable under perturbation") {
    val rnd = new scala.util.Random(7)
    // a 90×80 "photo" with smooth structure (so dHash bits are driven
    // by real gradients, not noise): value = smooth ramp + texture
    def basePixels: Array[Int] = Array.tabulate(90 * 80) { i =>
      val x = i % 90; val y = i / 90
      (x * 2 + y + 40 * math.sin(x / 9.0).toInt + (rnd.nextInt(7) - 3)) & 0xff
    }
    val base = basePixels
    // mild perturbation: small additive noise — same image perceptually
    val perturbed = base.map(v => (v + rnd.nextInt(5) - 2) & 0xff)
    // a genuinely different image
    val other = Array.tabulate(90 * 80) { i => ((i * 2654435761L) >>> 13).toInt & 0xff }
    def hash(px: Array[Int]) =
      Media.dHash64(Media.grayBmp(px, 90, 80)).get
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (hb, hp, ho) = (hash(base), hash(perturbed), hash(other))
    assert(hamming(hb, hp) <= 7, s"perturbed copy drifted ${hamming(hb, hp)} bits")
    assert(hamming(hb, ho) > 7, s"unrelated image landed ${hamming(hb, ho)} bits away")
    // identity case: a 9×8 bitmap round-trips through write→decode to
    // exactly the closed-form gradient bits (the q86 oracle's contract)
    val small = Array.tabulate(72)(idx => (idx * 31 + 7) % 256)
    val direct = (0 until 64).foldLeft(0L) { (h, k) =>
      if (small((k / 8) * 9 + k % 8) > small((k / 8) * 9 + k % 8 + 1)) h | (1L << k) else h
    }
    assert(hash2(small) == direct)
    def hash2(px: Array[Int]) = Media.dHash64(Media.grayBmp(px, 9, 8)).get
    // end to end: the blocked hamming join surfaces the planted pair
    // and not the unrelated one
    val sigs = Seq((1L, hb), (2L, hp), (3L, ho)).toDF("doc_id", "dhash")
    val pairs = Dedup.hammingNearDups(sigs, "doc_id", "dhash", maxHamming = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // undecodable blobs drop out rather than fake a signature
    assert(Media.dHash64("not an image".getBytes).isEmpty)
  }

  test("sharded sequence packing: shard=1 is identical, shards only add boundary bins") {
    import graft.queries.QueryPack
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("lang", "n_docs", "total_tokens", "n_bins", "n_boundary_docs")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    val unsharded = rows(QueryPack.sequencePack(spark, sfDir))
    val one = rows(QueryPack.sequencePackSharded(spark, sfDir, 1))
    assert(one == unsharded)
    val sharded = rows(QueryPack.sequencePackSharded(spark, sfDir, 8))
    assert(sharded.keySet == unsharded.keySet)
    for ((lang, (nd, tt, bins, _)) <- sharded) {
      val (nd0, tt0, bins0, _) = unsharded(lang)
      assert(nd == nd0 && tt == tt0, s"$lang doc/token totals must not change")
      // bins never span shards: per-shard ceils sum to ≥ the global
      // ceil, within nShards−1 extra partially-filled bins
      assert(bins >= bins0 && bins <= bins0 + 7, s"$lang bins $bins0 -> $bins")
    }
  }

  test("media frame sampling amplifies rows by ceil(bytes/frameSize)") {
    val media = Media.attachBlob(docs.limit(10))
    val frames = Media.sampleFrames(media, frameBytes = 100).collect()
    val byDoc = frames.groupBy(_.doc_id)
    val sizes = media.select($"doc_id", length($"blob")).as[(Long, Int)].collect().toMap
    byDoc.foreach { case (docId, fs) =>
      assert(fs.length == math.ceil(sizes(docId) / 100.0).toInt)
      assert(fs.map(_.frame_bytes.length).sum == sizes(docId))
    }
  }

  test("streaming sessionization: gap close in-batch and timeout close by watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(minute: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
    val input = MemoryStream[Sessionize.UserEvent]
    val sessions = Sessionize.streamingSessions(input.toDS(), gapSeconds = 300)
    val query = sessions.writeStream.format("memory")
      .queryName("sessions_stream").outputMode("append").start()
    try {
      // user 1: two events 1 min apart, then an 11-minute gap closes the
      // first session within the same user partition
      input.addData(
        Sessionize.UserEvent(1L, ts(0)), Sessionize.UserEvent(1L, ts(1)),
        Sessionize.UserEvent(1L, ts(12)),
        Sessionize.UserEvent(2L, ts(0)))
      query.processAllAvailable()
      // (1,2) closes by in-batch gap; (2,1) closes by event-time timeout
      // once the batch-1 watermark (00:11:50) passes 00:00 + gap
      val afterBatch1 = spark.table("sessions_stream").as[Sessionize.ClosedSession].collect()
      assert(afterBatch1.map(s => (s.user_id, s.n_events)).toSet == Set((1L, 2L), (2L, 1L)))

      // advancing the watermark far past last+gap times out the rest
      input.addData(Sessionize.UserEvent(3L, ts(59)))
      query.processAllAvailable()
      input.addData(Sessionize.UserEvent(3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00")))
      query.processAllAvailable()
      val all = spark.table("sessions_stream").as[Sessionize.ClosedSession].collect()
      assert(all.map(s => (s.user_id, s.n_events)).toSet
        .intersect(Set((1L, 1L), (2L, 1L))) == Set((1L, 1L), (2L, 1L)))
    } finally query.stop()
  }

  test("streaming sessionization agrees with the batch operator once all sessions close") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // deterministic event set: 3 users, known gaps
    val events = for {
      user <- 1L to 3L
      session <- 0 until user.toInt
      i <- 0 until 3
    } yield Sessionize.UserEvent(user,
      new java.sql.Timestamp(1700000000000L + session * 3600_000L + i * 60_000L + user * 7_000L))

    val batch = Sessionize.sessionCounts(
        events.toDF(), "user_id", "ts", gapSeconds = 1800L)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap

    val input = MemoryStream[Sessionize.UserEvent]
    val query = Sessionize.streamingSessions(input.toDS(), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sessions_consistency")
      .outputMode("append").start()
    try {
      input.addData(events)
      query.processAllAvailable()
      // sentinel user far in the future times out every open session
      input.addData(Sessionize.UserEvent(99L, new java.sql.Timestamp(1700900000000L)))
      query.processAllAvailable()
      val streamed = spark.table("sessions_consistency")
        .as[Sessionize.ClosedSession].collect()
        .filter(_.user_id != 99L)
        .groupBy(_.user_id).view.mapValues(_.length.toLong).toMap
      assert(streamed == batch)
      assert(batch == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    } finally query.stop()
  }

  test("streaming dedup drops re-deliveries within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = Dedup.streamingDedup(
      input.toDF().toDF("event_id", "ts"), Seq("event_id"), "ts", "10 seconds")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData((1L, t), (1L, t), (2L, t))
      query.processAllAvailable()
      input.addData((1L, t), (3L, t)) // re-delivery in a later batch
      query.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("media resize stub downsamples deterministically") {
    val media = Media.attachBlob(docs.limit(5))
    val resized = Media.resize(media, targetBytes = 64).collect()
    assert(resized.forall(_._2.length <= 64))
    val again = Media.resize(media, targetBytes = 64).collect().toMap
    resized.foreach { case (id, bytes) => assert(again(id).sameElements(bytes)) }
  }

  test("salted aggregation and join match their unsalted equivalents") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity",
        saltBuckets = 8, saltSource = col("l_orderkey"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("sum_l_quantity"), r.getAs[Long]("n"))).toMap
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("s"), r.getAs[Long]("n"))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n == plain(k)._2)
      assert(math.abs(s - plain(k)._1) < 1e-6)
    }

    val orders = graft.Tables.orders(spark, sfDir)
    val customers = graft.Tables.customer(spark, sfDir)
    val saltedJoined = Skew.saltedJoin(
      orders.withColumnRenamed("o_custkey", "c_custkey"), customers,
      "c_custkey", saltBuckets = 4, saltSource = col("o_orderkey"))
    val plainJoined = orders.join(customers, orders("o_custkey") === customers("c_custkey"))
    assert(saltedJoined.count() == plainJoined.count())
  }

  test("sessionize counts sessions per gap rule") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:10:00")), // gap > 30 min
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    ).toDF("user_id", "ts")
    val counts = Sessionize.sessionCounts(events, "user_id", "ts", 1800L)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    assert(counts == Map(1L -> 2L, 2L -> 1L))
  }
}
