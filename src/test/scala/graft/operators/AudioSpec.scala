package graft.operators

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** WAV segment index + PCM decode — known-answer on synthesized audio,
  * multi-chunk/odd-size edge cases, and the truncation fuzz every
  * container parser here carries (MediaContainerProperties pattern):
  * a cut-anywhere blob must never throw, only shrink the index.
  */
class AudioSpec extends AnyFunSuite with SparkTest {

  private def pcm16(samples: Seq[Int]): Array[Byte] =
    samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray

  test("known-answer: synthesized waveform indexes and decodes exactly") {
    // 200 samples at 8 kHz = 25 ms → 3 segments of 80/80/40 samples
    val samples = (0 until 200).map {
      case 0 => 0
      case 5 => 32767   // max positive, segment 0
      case 90 => -32768 // max negative, segment 1
      case i => (if (i % 2 == 0) 1 else -1) * (i % 7) * 100
    }
    val wav = Media.wrapWav(pcm16(samples))
    val idx = Media.wavChunks(7L, wav, segmentMs = 10L).get
    assert(idx.map(c => (c.segment_index, c.offset, c.size, c.start_ms, c.n_samples)) ==
      Vector((0, 44L, 160L, 0L, 80L), (1, 204L, 160L, 10L, 80L), (2, 364L, 80L, 20L, 40L)))
    assert(idx.forall(c => c.sample_rate == 8000 && c.channels == 1 && c.bits == 16))
    // exact integer decode per segment
    import spark.implicits._
    val stats = Media.audioSegmentStats(
        Seq((7L, wav)).toDF("doc_id", "blob"), segmentMs = 10L)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    def expect(lo: Int, hi: Int) = {
      val s = samples.slice(lo, hi).map(v => math.abs(v.toLong))
      (s.max, s.sum)
    }
    assert(stats(0) == expect(0, 80), "segment 0 peak/sum_abs")
    assert(stats(1) == expect(80, 160), "segment 1 must carry the -32768 peak")
    assert(stats(2) == expect(160, 200))
  }

  test("odd payload: the dangling byte is never a sample; empty payload emits nothing") {
    val odd = Media.wrapWav(Array[Byte](1, 2, 3)) // 1 frame + 1 dangling byte
    val idx = Media.wavChunks(1L, odd, 10L).get
    assert(idx.map(c => (c.size, c.n_samples)) == Vector((2L, 1L)))
    assert(Media.wavChunks(1L, Media.wrapWav(Array.emptyByteArray), 10L).get.isEmpty)
  }

  test("multiple data chunks: global time accumulates, segments never span chunks") {
    def le4(i: Int) = Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte,
      ((i >> 16) & 0xff).toByte, ((i >> 24) & 0xff).toByte)
    val base = Media.wrapWav(pcm16(0 until 100)) // one 100-frame data chunk
    val extra = "data".getBytes("ISO-8859-1") ++ le4(120) ++ pcm16(0 until 60)
    val riffBody = java.util.Arrays.copyOfRange(base, 8, base.length) ++ extra
    val twoChunk = "RIFF".getBytes("ISO-8859-1") ++ le4(riffBody.length) ++ riffBody
    val idx = Media.wavChunks(2L, twoChunk, 10L).get
    // chunk 1: 100 frames → 80 + 20; chunk 2: 60 frames → one segment
    // starting at global frame 100 (12 ms) at ITS OWN chunk offset
    assert(idx.map(c => (c.segment_index, c.start_ms, c.n_samples)) ==
      Vector((0, 0L, 80L), (1, 10L, 20L), (2, 12L, 60L)))
    assert(idx(2).offset == base.length + 8,
      "second data chunk's samples are addressed in its own payload")
  }

  test("non-PCM, non-WAVE, and degenerate-geometry blobs return None") {
    val wav = Media.wrapWav(pcm16(0 until 10))
    val nonPcm = wav.clone
    nonPcm(20) = 3 // format tag: IEEE float
    assert(Media.wavChunks(1L, nonPcm, 10L).isEmpty)
    val notWave = wav.clone
    notWave(8) = 'A'.toByte
    assert(Media.wavChunks(1L, notWave, 10L).isEmpty)
    assert(Media.wavChunks(1L, Array.emptyByteArray, 10L).isEmpty)
    assert(Media.wavChunks(1L, "RIFF".getBytes("ISO-8859-1"), 10L).isEmpty)
    // a 0 ms segment window can never make progress — rejected, not ∞-loop
    assert(Media.wavChunks(1L, wav, 0L).isEmpty)
  }

  test("fuzz: every truncation parses without throwing to a prefix of the full index") {
    val wav = Media.wrapWav(pcm16(0 until 300), sampleRate = 16000, channels = 2)
    val full = Media.wavChunks(9L, wav, 10L).get
    assert(full.nonEmpty && full.forall(_.channels == 2))
    (0 until wav.length).foreach { cut =>
      val got = Media.wavChunks(9L, java.util.Arrays.copyOf(wav, cut), 10L)
        .getOrElse(Vector.empty)
      // truncation may shorten the LAST surviving data chunk (its
      // declared size overruns the cut and walkRiff drops it), so the
      // surviving index is a prefix of the full one
      assert(got == full.take(got.length),
        s"truncation at $cut produced a non-prefix index")
    }
  }

  test("audio routing runs unchanged on a stream (stateless, append mode)") {
    // ingest-time audio indexing — the streaming twin every routing
    // index here carries (frameChunkIndex precedent): wavSampleIndex is
    // a stateless map-side flatMap, so it lifts to streaming with no
    // watermark or state store, and streamed rows equal batch rows
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wav = Media.wrapWav(pcm16(0 until 200))
    val input = MemoryStream[(Long, Array[Byte])]
    val indexed = Media.wavSampleIndex(input.toDF().toDF("doc_id", "blob"))
    val q = indexed.writeStream.format("memory")
      .queryName("audio_stream").outputMode("append").start()
    try {
      input.addData((1L, wav), (2L, "not audio".getBytes))
      q.processAllAvailable()
      val rows = spark.table("audio_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(4)))
      assert(rows.count(_._1 == 1L) == 3 && !rows.exists(_._1 == 2L))
      val batch = Media.wavSampleIndex(Seq((1L, wav)).toDF("doc_id", "blob"))
        .collect().map(c => (c.doc_id, c.segment_index, c.offset, c.start_ms))
      assert(rows.filter(_._1 == 1L).sortBy(_._2).toSeq == batch.sortBy(_._2).toSeq)
    } finally q.stop()
  }

  test("the JDK's own WAV reader agrees with the hand-rolled header walk") {
    val wav = Media.wrapWav(pcm16(0 until 160))
    val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(wav))
    assert(ff.getFormat.getSampleRate == 8000f)
    assert(ff.getFormat.getChannels == 1)
    assert(ff.getFrameLength == 160)
  }
}
