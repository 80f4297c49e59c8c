package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata extracted by a partition-mapped decoder.
  *
  * Blobs whose magic bytes identify a JDK-decodable format are decoded
  * for REAL, header-only — the decode a 100 TB metadata pass should do:
  * images (PNG / JPEG / GIF / BMP) via `javax.imageio`
  * (`ImageReader.getWidth/getHeight` read dimensions from the stream
  * header without materializing pixels), audio (WAV / AIFF) via
  * `javax.sound.sampled.AudioSystem.getAudioFileFormat` (sample rate,
  * channels, frame count — samples never decoded), and video (MP4 /
  * AVI) via a hand-rolled CONTAINER header parse (ISO-BMFF box walk to
  * `moov/mvhd` + `trak/tkhd`, RIFF walk to `hdrl/avih`) — container
  * metadata needs no codec, only frame decode does, so
  * width/height/duration come out real while pixel decode remains the
  * FFmpeg-shaped gap documented below. Other blobs (the oracle corpus
  * uses document text as a stand-in payload) fall back to a
  * deterministic fake clearly marked below.
  * Everything around the codec call is the real large-scale
  * shape: binary column + schema, `mapPartitions` batch decode (one
  * decoder context per partition, not per row — exactly where a
  * JNI/FFmpeg library handle would be initialized), explode for frame
  * sampling, and aggregation over the typed metadata.
  */
object Media {

  final case class MediaMeta(
      doc_id: Long, format: String, width: Int, height: Int, n_bytes: Long,
      // audio-only fields (None for images and the stub): real WAV/AIFF
      // header decode fills these via javax.sound.sampled
      sample_rate: Option[Int] = None, channels: Option[Int] = None,
      duration_ms: Option[Long] = None)

  final case class Frame(doc_id: Long, frame_index: Int, frame_bytes: Array[Byte])

  /** One audio SEGMENT's byte location inside its WAV blob — the audio
    * sibling of [[FrameChunk]]: offset/size let a downstream feature
    * extractor (or external codec, for compressed audio) slice a
    * time-window's PCM bytes out of the blob without re-parsing the
    * container; start_ms/n_samples let a sampling pass pick windows on
    * the index alone. One row per fixed-duration segment of each `data`
    * chunk (10 ms segments by default — the standard speech-feature
    * hop).
    */
  final case class AudioChunk(
      doc_id: Long, segment_index: Int, offset: Long, size: Long,
      start_ms: Long, n_samples: Long, sample_rate: Int, channels: Int,
      bits: Int)

  /** One video frame's CHUNK LOCATION inside its container blob —
    * codec-independent: offset/size let a downstream external decoder
    * (the FFmpeg-shaped dependency this container lacks) slice the
    * frame's bytes out of the blob without re-parsing the container.
    * `codec_kind` is the RIFF chunk suffix: "db" = uncompressed DIB
    * (decodable here, see [[aviUncompressedFrames]]), "dc" = compressed.
    * `keyframe` comes from the `idx1` AVIOLDINDEX when present
    * (AVIIF_KEYFRAME); uncompressed DIB frames are self-contained so
    * they default to `Some(true)` without an index, while compressed
    * frames without an index are `None` (unknown). `pts_ms` is the
    * frame's presentation time (AVI: frame_index × avih
    * dwMicroSecPerFrame; MP4: cumulative `stts` deltas over the `mdhd`
    * timescale), `None` when the container omits timing — it lets a
    * sampling pass select "one frame per N seconds" on the index alone.
    */
  final case class FrameChunk(
      doc_id: Long, frame_index: Int, stream_id: Int, codec_kind: String,
      offset: Long, size: Long, keyframe: Option[Boolean],
      pts_ms: Option[Long] = None)

  /** Attach the binary payload column. With no true media corpus in the
    * testdata, document text stands in as the blob — the schema and
    * execution path are identical for real image bytes.
    */
  def attachBlob(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("blob", col(textCol).cast("binary"))

  /** Magic-byte sniff for the formats the JDK can decode. Cheap (first
    * four bytes) and runs BEFORE any decoder is touched, so arbitrary
    * non-image payloads never reach ImageIO.
    */
  private[operators] def sniffFormat(bytes: Array[Byte]): Option[String] = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') Some("png")
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) Some("jpeg")
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') Some("gif")
    else if (at(0) == 'B' && at(1) == 'M' && bytes.length >= 6 &&
        // "BM" is only a 2-byte magic — text can start with it; require
        // the header's little-endian file size to match the payload
        (at(2) | at(3) << 8 | at(4) << 16 | at(5) << 24) == bytes.length)
      Some("bmp")
    // audio containers carry an 8-byte two-part magic (chunk id + form
    // type), so plain text can't collide the way 2-byte "BM" does
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
        at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E')
      Some("wav")
    else if (at(0) == 'F' && at(1) == 'O' && at(2) == 'R' && at(3) == 'M' &&
        at(8) == 'A' && at(9) == 'I' && at(10) == 'F' &&
        (at(11) == 'F' || at(11) == 'C'))
      Some("aiff")
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
        at(8) == 'A' && at(9) == 'V' && at(10) == 'I' && at(11) == ' ')
      Some("avi")
    // ISO-BMFF: first box is 'ftyp' — the 4-byte type at offset 4
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p')
      Some("mp4")
    else None
  }

  // --- video container parsing (no codec required for METADATA) -------

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ISO-8859-1")

  /** All ISO-BMFF boxes of `typ` directly inside [start, end): returns
    * (boxStart, payloadStart, payloadEnd) per box — boxStart is the
    * box's own first byte (the offset base `moof`-relative fragment
    * runs resolve against). Handles 64-bit `largesize` (size==1) and
    * to-end (size==0) encodings; stops at malformation.
    */
  private def mp4BoxesWithStart(
      b: Array[Byte], start: Int, end: Int, typ: String): List[(Int, Int, Int)] = {
    val out = List.newBuilder[(Int, Int, Int)]
    var off = start
    var ok = true
    while (ok && off + 8 <= end) {
      val size0 = be32(b, off)
      val (hdr, size) =
        if (size0 == 1 && off + 16 <= end) (16, be64(b, off + 8))
        else if (size0 == 0) (8, (end - off).toLong)
        else (8, size0)
      if (size < hdr || off + size > end) ok = false
      else {
        if (fourcc(b, off + 4) == typ) out += ((off, off + hdr, off + size.toInt))
        off += size.toInt
      }
    }
    out.result()
  }

  private def mp4Boxes(b: Array[Byte], start: Int, end: Int, typ: String): List[(Int, Int)] =
    mp4BoxesWithStart(b, start, end, typ).map { case (_, p, e) => (p, e) }

  /** MP4 metadata: duration from `moov/mvhd` (duration/timescale),
    * width/height from the first `trak/tkhd` with a nonzero width (audio
    * tracks carry 0×0). Pure byte parsing of the ISO-BMFF box tree —
    * the right cost shape for a metadata pass over a billion videos:
    * O(header bytes), no codec, no frame data touched.
    */
  private def parseMp4(docId: Long, b: Array[Byte]): Option[MediaMeta] =
    try {
      mp4Boxes(b, 0, b.length, "moov").headOption.flatMap { case (ms, me) =>
        val durationMs = mp4Boxes(b, ms, me, "mvhd").headOption.flatMap { case (s, _) =>
          val v = b(s) & 0xff
          val (timescale, duration) =
            if (v == 1) (be32(b, s + 20), be64(b, s + 28))
            else (be32(b, s + 12), be32(b, s + 16))
          if (timescale > 0) Some(duration * 1000L / timescale) else None
        }
        val dims = mp4Boxes(b, ms, me, "trak").iterator
          .flatMap { case (ts, te) => mp4Boxes(b, ts, te, "tkhd") }
          .map { case (s, _) =>
            val v = b(s) & 0xff
            val base = if (v == 1) s + 88 else s + 76 // past times+matrix
            // 16.16 fixed point
            ((be32(b, base) >> 16).toInt, (be32(b, base + 4) >> 16).toInt)
          }
          .find(_._1 > 0)
        if (durationMs.isEmpty && dims.isEmpty) None
        else {
          val (w, h) = dims.getOrElse((0, 0))
          Some(MediaMeta(docId, "mp4", w, h, b.length.toLong, duration_ms = durationMs))
        }
      }
    } catch { case _: Exception => None }

  /** AVI metadata from the `hdrl` LIST's `avih` chunk: width/height and
    * duration = totalFrames × microSecPerFrame. RIFF chunks are
    * little-endian and pad to even offsets.
    */
  private def parseAvi(docId: Long, b: Array[Byte]): Option[MediaMeta] =
    try {
      val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
      // walk RIFF chunks to LIST('hdrl')/avih; chunks pad to even sizes
      def findAvih(start: Int, end: Int): Option[Int] = {
        var off = start
        while (off + 8 <= end) {
          val ck = fourcc(b, off)
          val size = le32(b, off + 4).toInt
          val payload = off + 8
          if (size < 0 || payload + size > end) return None
          if (ck == "avih") return Some(payload)
          if (ck == "LIST" && size >= 4 && fourcc(b, payload) == "hdrl") {
            val sub = findAvih(payload + 4, payload + size)
            if (sub.isDefined) return sub
          }
          off = payload + size + (size & 1)
        }
        None
      }
      findAvih(12, riffEnd).filter(_ + 40 <= b.length).map { p =>
        val usPerFrame = le32(b, p) // dwMicroSecPerFrame
        val totalFrames = le32(b, p + 16) // dwTotalFrames
        // both fields are unsigned 32-bit: an adversarial 0xFFFFFFFF
        // pair overflows Long in the product — emit None, not a
        // wrapped-negative duration
        val durationMs =
          if (usPerFrame > 0 && totalFrames <= Long.MaxValue / usPerFrame)
            Some(totalFrames * usPerFrame / 1000L)
          else None
        MediaMeta(docId, "avi",
          width = le32(b, p + 32).toInt, height = le32(b, p + 36).toInt,
          n_bytes = b.length.toLong, duration_ms = durationMs)
      }
    } catch { case _: Exception => None }

  /** Depth-first RIFF chunk walk shared by every AVI parser: recurses
    * into LISTs tracking whether the cursor sits inside a `movi` data
    * LIST (directly or via `rec ` interleave grouping), fires
    * `onChunk(fourcc, payloadOffset, size, inMovi)` for every leaf
    * chunk, and stops at the first malformed/truncated header (size
    * negative or past the enclosing boundary) — so callers only ever
    * see chunks whose payload is fully inside the blob.
    */
  private def walkRiff(b: Array[Byte])(
      onChunk: (String, Int, Int, Boolean) => Unit): Unit = {
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val ck = fourcc(b, off)
        val size = le32(b, off + 4).toInt
        val payload = off + 8
        if (size < 0 || payload + size > end) return
        if (ck == "LIST" && size >= 4)
          walk(payload + 4, payload + size,
            inMovi = inMovi || fourcc(b, payload) == "movi")
        else onChunk(ck, payload, size, inMovi)
        off = payload + size + (size & 1)
      }
    }
    walk(12, riffEnd, inMovi = false)
  }

  /** Uncompressed-AVI FRAME extraction — the one video-frame decode
    * possible with zero codecs: `##db` chunks in the `movi` LIST are
    * plain device-independent bitmaps (DIB), so their payload IS the
    * frame. Returns the frames in stream order, or None when the
    * payload is not an AVI or its movi list carries no uncompressed
    * frame (`##dc` compressed chunks need a real codec and keep the
    * documented stub path). Frames inside `rec ` grouping LISTs are
    * walked too (interleaved AVIs group chunks per record).
    */
  private[operators] def aviUncompressedFrames(
      docId: Long, b: Array[Byte]): Option[Vector[Frame]] =
    try {
      if (!sniffFormat(b).contains("avi")) None
      else {
        val out = Vector.newBuilder[Array[Byte]]
        def isDb(ck: String): Boolean =
          ck.length == 4 && ck(0).isDigit && ck(1).isDigit &&
            ck(2) == 'd' && ck(3) == 'b'
        walkRiff(b) { (ck, payload, size, inMovi) =>
          if (inMovi && isDb(ck))
            out += java.util.Arrays.copyOfRange(b, payload, payload + size)
        }
        val frames = out.result()
        if (frames.isEmpty) None
        else Some(frames.zipWithIndex.map { case (bytes, i) => Frame(docId, i, bytes) })
      }
    } catch { case _: Exception => None }

  /** AVI FRAME-CHUNK INDEX — parse, don't decode: every video chunk
    * (`##db` uncompressed, `##dc` compressed) in the `movi` LIST is
    * located by absolute (offset, size) into the blob, so compressed
    * codecs — which this JVM cannot decode — still get a real routing
    * path: a downstream pipeline slices `blob[offset, offset+size)` and
    * hands it to an external decoder service without re-walking RIFF.
    * Keyframe flags are recovered from the optional `idx1` AVIOLDINDEX
    * chunk (entries matched to movi chunks per-chunk-id in stream
    * order, which sidesteps the notorious movi-relative-vs-absolute
    * idx1 offset-base ambiguity entirely).
    */
  private[operators] def aviFrameChunkIndex(
      docId: Long, b: Array[Byte]): Option[Vector[FrameChunk]] =
    try {
      if (!sniffFormat(b).contains("avi")) None
      else {
        // (chunkId, payloadOffset, size) for video chunks, stream order
        val chunks = Vector.newBuilder[(String, Int, Int)]
        var idx1At = -1 // payload offset of the idx1 chunk, if any
        var usPerFrame = 0L // avih dwMicroSecPerFrame, 0 = no timing
        def isVideoChunk(ck: String): Boolean =
          ck.length == 4 && ck(0).isDigit && ck(1).isDigit &&
            ck(2) == 'd' && (ck(3) == 'b' || ck(3) == 'c')
        walkRiff(b) { (ck, payload, size, inMovi) =>
          if (inMovi && isVideoChunk(ck)) chunks += ((ck, payload, size))
          else if (!inMovi && ck == "idx1") idx1At = payload
          else if (!inMovi && ck == "avih" && size >= 4)
            usPerFrame = le32(b, payload)
        }
        val vid = chunks.result()
        if (vid.isEmpty) None
        else {
          // idx1 flags per chunk id, in entry order (16-byte entries:
          // fourcc id, LE32 flags, LE32 offset, LE32 size); matched to
          // movi chunks sequentially per id
          val flagQueues = scala.collection.mutable.Map
            .empty[String, scala.collection.mutable.Queue[Long]]
          if (idx1At >= 0) {
            val idxSize = le32(b, idx1At - 4).toInt
            var e = idx1At
            while (e + 16 <= idx1At + idxSize && e + 16 <= b.length) {
              val id = fourcc(b, e)
              flagQueues.getOrElseUpdate(id,
                scala.collection.mutable.Queue.empty) += le32(b, e + 4)
              e += 16
            }
          }
          val aviifKeyframe = 0x10L
          // frame_index and pts count PER STREAM (interleaved multi-
          // stream AVIs alternate 00dc/01dc chunks — a global counter
          // would double every stream's pts and misnumber its frames)
          val perStream = scala.collection.mutable.Map.empty[Int, Int]
          Some(vid.map { case (ck, payload, size) =>
            val sid = ck.take(2).toInt
            val i = perStream.getOrElse(sid, 0)
            perStream(sid) = i + 1
            val keyframe = flagQueues.get(ck).filter(_.nonEmpty) match {
              case Some(q) => Some((q.dequeue() & aviifKeyframe) != 0)
              case None    => if (ck(3) == 'b') Some(true) else None
            }
            FrameChunk(docId, i, stream_id = sid,
              codec_kind = ck.substring(2), offset = payload.toLong,
              size = size.toLong, keyframe = keyframe,
              pts_ms = if (usPerFrame > 0) Some(i * usPerFrame / 1000L) else None)
          })
        }
      }
    } catch { case _: Exception => None }

  /** Per-video-track header info pulled from `moov` — what both the
    * stbl sample walk and the moof fragment walk need: the spec keys
    * fragments to tracks by `track_ID` (tkhd/tfhd), while `stream_id`
    * in the output stays the index among VIDEO tracks in moov order.
    */
  private final case class TrackInfo(
      trackId: Long, streamId: Int, timescale: Long, codec: String,
      stbl: Option[(Int, Int)],
      // mvex/trex per-track defaults, applied when a fragment's tfhd/
      // trun omit the field: (size, duration, flags)
      trexSize: Option[Long], trexDuration: Option[Long], trexFlags: Option[Long])

  /** MP4 FRAME-CHUNK INDEX — the ISO-BMFF twin of
    * [[aviFrameChunkIndex]]: video samples are located from the `stbl`
    * sample tables without touching `mdat` — `stsz` (sizes), `stco` /
    * `co64` (chunk offsets), `stsc` (sample→chunk runs), `stss` (sync
    * samples; absent ⇒ every sample is a keyframe, per spec) — AND, for
    * fragmented files (DASH/fMP4, the dominant crawled-video layout),
    * from the per-fragment `moof/traf/trun` run tables: trun sample
    * sizes/flags/durations with tfhd/trex defaults filled in, base data
    * offsets resolved per spec (tfhd base-data-offset when present,
    * else the enclosing moof's first byte for the first traf /
    * default-base-is-moof, else the preceding traf's data end), and
    * presentation time from `tfdt` + cumulative durations (+ trun
    * composition offsets). Offsets come out absolute into the blob,
    * `codec_kind` is the `stsd` sample entry's fourcc (e.g. "avc1"), so
    * a downstream external decoder can slice exactly the samples it
    * wants. Tracks are filtered to video via `mdia/hdlr` = 'vide'; a
    * truncated file or a trun whose sizes can't be resolved yields no
    * rows for that fragment rather than wrong offsets.
    */
  private[operators] def mp4FrameChunkIndex(
      docId: Long, b: Array[Byte]): Option[Vector[FrameChunk]] =
    try {
      if (!sniffFormat(b).contains("mp4")) None
      else {
        def boxes(rs: List[(Int, Int)], typ: String): List[(Int, Int)] =
          rs.flatMap { case (s, e) => mp4Boxes(b, s, e, typ) }
        val moov = boxes(List((0, b.length)), "moov")
        val traks = boxes(moov, "trak")
        // mvex/trex defaults keyed by track_ID
        val trex: Map[Long, (Long, Long, Long)] =
          boxes(boxes(moov, "mvex"), "trex").flatMap { case (p, e) =>
            if (p + 24 > e) None
            else Some(be32(b, p + 4) ->
              (be32(b, p + 16), be32(b, p + 12), be32(b, p + 20)))
          }.toMap
        val videoTracks: List[TrackInfo] = traks.flatMap { trak =>
          val mdia = boxes(List(trak), "mdia")
          val isVideo = boxes(mdia, "hdlr").exists { case (hs, he) =>
            hs + 12 <= he && fourcc(b, hs + 8) == "vide" }
          if (!isVideo) Nil
          else {
            // tkhd: track_ID after version/flags + create/modify times
            // (v0: 4+4+4 bytes before it; v1: 4+8+8)
            val trackId = boxes(List(trak), "tkhd").headOption.flatMap {
              case (p, e) =>
                val at = if (p < e && b(p) == 1) p + 20 else p + 12
                if (at + 4 <= e) Some(be32(b, at)) else None
            }.getOrElse(-1L)
            // mdhd: media timescale (ticks/second) — version 0 places it
            // after 4+4+4 bytes of version/ctime/mtime, version 1 after
            // 4+8+8 (64-bit times)
            val timescale = boxes(mdia, "mdhd").headOption.flatMap {
              case (p, e) =>
                if (p + 4 > e) None
                else {
                  val at = if (b(p) == 1) p + 20 else p + 12
                  if (at + 4 <= e) Some(be32(b, at)) else None
                }
            }.getOrElse(0L)
            val stbl = boxes(boxes(mdia, "minf"), "stbl").headOption
            val codec = boxes(stbl.toList, "stsd").headOption
              .filter { case (p, e) => p + 16 <= e }
              .map { case (p, _) => fourcc(b, p + 12) }.getOrElse("????")
            val tx = trex.get(trackId)
            List(TrackInfo(trackId, streamId = 0, timescale, codec, stbl,
              tx.map(_._1).filter(_ > 0), tx.map(_._2).filter(_ > 0),
              tx.map(_._3)))
          }
        }.zipWithIndex.map { case (t, i) => t.copy(streamId = i) }
        val moovSamples = videoTracks.flatMap { track =>
          val st = track.stbl.toList
          val (timescale, streamId, codec) =
            (track.timescale, track.streamId, track.codec)
          // every expansion is capped by what the blob could possibly
          // index: a corrupt sample_count must not allocate unbounded
          // memory (OOM is an Error and would escape the Exception
          // catch, killing the executor)
          val tableCap = math.min(b.length.toLong, 4L * 1024 * 1024).toInt
          val sizes = boxes(st, "stsz").headOption.flatMap { case (p, e) =>
            if (p + 12 > e) None
            else {
              val fixed = be32(b, p + 4)
              val n = be32(b, p + 8).toInt
              if (n < 0 || n > tableCap) None
              else if (fixed != 0) Some(Vector.fill(n)(fixed))
              else if (p + 12 + 4L * n > e) None
              else Some(Vector.tabulate(n)(i => be32(b, p + 12 + 4 * i)))
            }
          }
          val chunkOffsets = boxes(st, "stco").headOption.flatMap { case (p, e) =>
            val n = if (p + 8 <= e) be32(b, p + 4).toInt else -1
            if (n < 0 || p + 8 + 4L * n > e) None
            else Some(Vector.tabulate(n)(i => be32(b, p + 8 + 4 * i)))
          }.orElse(boxes(st, "co64").headOption.flatMap { case (p, e) =>
            val n = if (p + 8 <= e) be32(b, p + 4).toInt else -1
            if (n < 0 || p + 8 + 8L * n > e) None
            else Some(Vector.tabulate(n)(i => be64(b, p + 8 + 8 * i)))
          })
          // (first_chunk, samples_per_chunk) runs; each applies until
          // the next entry's first_chunk
          val sampleRuns = boxes(st, "stsc").headOption.flatMap { case (p, e) =>
            val n = if (p + 8 <= e) be32(b, p + 4).toInt else -1
            if (n < 0 || p + 8 + 12L * n > e) None
            else Some(Vector.tabulate(n)(i =>
              (be32(b, p + 8 + 12 * i).toInt, be32(b, p + 12 + 12 * i).toInt)))
          }
          val syncSamples = boxes(st, "stss").headOption.flatMap { case (p, e) =>
            val n = if (p + 8 <= e) be32(b, p + 4).toInt else -1
            if (n < 0 || p + 8 + 4L * n > e) None
            else Some(Vector.tabulate(n)(i => be32(b, p + 8 + 4 * i).toInt).toSet)
          }
          // stts (sample_count, sample_delta) runs → per-sample start
          // tick; ms via the mdhd timescale
          val sampleStartTicks = boxes(st, "stts").headOption.flatMap {
            case (p, e) =>
              val n = if (p + 8 <= e) be32(b, p + 4).toInt else -1
              if (n < 0 || p + 8 + 8L * n > e) None
              else {
                val cap = tableCap
                val out = Vector.newBuilder[Long]
                var total = 0
                var t = 0L
                var i = 0
                while (i < n && total <= cap) {
                  val cnt = be32(b, p + 8 + 8 * i).toInt
                  val delta = be32(b, p + 12 + 8 * i)
                  var j = 0
                  while (j < cnt && total <= cap) {
                    out += t; t += delta; j += 1; total += 1
                  }
                  i += 1
                }
                if (total > cap) None else Some(out.result())
              }
          }
          (sizes, chunkOffsets, sampleRuns) match {
            case (Some(sz), Some(co), Some(runs))
                if sz.nonEmpty && co.nonEmpty && runs.nonEmpty =>
              val out = Vector.newBuilder[FrameChunk]
              var sample = 0 // 0-based; stss is 1-based
              var run = 0
              var chunk = 0
              while (chunk < co.length && sample < sz.length) {
                if (run + 1 < runs.length && chunk + 1 >= runs(run + 1)._1)
                  run += 1
                var off = co(chunk)
                var i = 0
                while (i < runs(run)._2 && sample < sz.length) {
                  val keyframe = syncSamples match {
                    case Some(ss) => Some(ss.contains(sample + 1))
                    case None     => Some(true)
                  }
                  val pts = sampleStartTicks match {
                    case Some(ticks) if timescale > 0 && sample < ticks.length =>
                      Some(ticks(sample) * 1000L / timescale)
                    case _ => None
                  }
                  // unlike AVI (whose walker bounds every chunk), stco/
                  // stsz offsets are free-standing claims about mdat: a
                  // truncated file or corrupt entry would point outside
                  // the blob — emit only locations a slice can honor,
                  // so downstream never zero-pads or throws
                  val size = sz(sample).toLong
                  if (off >= 0 && size >= 0 && off + size <= b.length)
                    out += FrameChunk(docId, sample, streamId, codec,
                      offset = off, size = size, keyframe = keyframe,
                      pts_ms = pts)
                  off += sz(sample)
                  sample += 1
                  i += 1
                }
                chunk += 1
              }
              out.result()
            case _ => Vector.empty
          }
        }

        // ---- fragmented samples: moof/traf/trun ----------------------
        val byTrackId = videoTracks.map(t => t.trackId -> t).toMap
        // frame_index continues per stream after any moov-based samples
        val frameAt = scala.collection.mutable.Map.empty[Int, Int]
        moovSamples.foreach(c =>
          frameAt(c.stream_id) = frameAt.getOrElse(c.stream_id, 0) + 1)
        // decode-time cursor per stream: tfdt overrides; absent tfdt
        // continues from the previous fragment's accumulated ticks
        val nextTick = scala.collection.mutable.Map.empty[Int, Long]
        val frag = Vector.newBuilder[FrameChunk]
        for ((moofStart, ms, me) <- mp4BoxesWithStart(b, 0, b.length, "moof")) {
          // default base data offset: first traf ⇒ moof's first byte,
          // later trafs ⇒ end of the preceding traf's data (per spec)
          var trafBaseDefault = moofStart.toLong
          for ((ts, te) <- mp4Boxes(b, ms, me, "traf")) {
            mp4Boxes(b, ts, te, "tfhd").headOption.foreach { case (p, e) =>
              val tfFlags = (be32(b, p) & 0xFFFFFFL).toInt
              var at = p + 4
              val trackId = be32(b, at); at += 4
              var baseOpt: Option[Long] = None
              if ((tfFlags & 0x01) != 0 && at + 8 <= e) {
                baseOpt = Some(be64(b, at)); at += 8
              }
              if ((tfFlags & 0x02) != 0) at += 4 // sample-description-index
              val defDur =
                if ((tfFlags & 0x08) != 0 && at + 4 <= e) {
                  val v = be32(b, at); at += 4; Some(v)
                } else None
              val defSize =
                if ((tfFlags & 0x10) != 0 && at + 4 <= e) {
                  // size 0 cannot locate a sample (same filter trex
                  // sizes get at parse time) — fall through to trex
                  val v = be32(b, at); at += 4; Some(v).filter(_ > 0)
                } else None
              val defFlags =
                if ((tfFlags & 0x20) != 0 && at + 4 <= e) {
                  val v = be32(b, at); at += 4; Some(v)
                } else None
              val base = baseOpt.getOrElse(
                if ((tfFlags & 0x20000) != 0) moofStart.toLong else trafBaseDefault)
              val track = byTrackId.get(trackId)
              // trex defaults resolve by track_ID for EVERY traf — a
              // non-video traf (audio, subtitles) must still advance
              // the data cursor through its truns, or the implicit
              // base offset of the NEXT traf (end of preceding traf's
              // data, per spec) lands on this traf's bytes and the
              // following video samples get wrong offsets; frames are
              // still emitted only for video tracks (`track.foreach`)
              val tx = trex.get(trackId)
              val fallbackSize = defSize.orElse(tx.map(_._1).filter(_ > 0))
              val fallbackDur = defDur.orElse(tx.map(_._2).filter(_ > 0))
              val fallbackFlags = defFlags.orElse(tx.map(_._3))
              val tfdt = mp4Boxes(b, ts, te, "tfdt").headOption.flatMap {
                case (tp, tend) =>
                  if (tp + 8 > tend) None
                  else if (b(tp) == 1 && tp + 12 <= tend) Some(be64(b, tp + 4))
                  else Some(be32(b, tp + 4))
              }
              var decodeTick = tfdt.getOrElse(
                track.map(t => nextTick.getOrElse(t.streamId, 0L)).getOrElse(0L))
              var cursor = base
              for ((rp, rend) <- mp4Boxes(b, ts, te, "trun")) {
                val trFlags = (be32(b, rp) & 0xFFFFFFL).toInt
                var rat = rp + 4
                val n = be32(b, rat).toInt; rat += 4
                val haveSize = (trFlags & 0x200) != 0 || fallbackSize.isDefined
                val haveDur = (trFlags & 0x100) != 0 || fallbackDur.isDefined
                var off =
                  if ((trFlags & 0x01) != 0 && rat + 4 <= rend) {
                    val d = be32(b, rat).toInt; rat += 4 // SIGNED int32
                    base + d
                  } else cursor
                val firstFlags =
                  if ((trFlags & 0x04) != 0 && rat + 4 <= rend) {
                    val v = be32(b, rat); rat += 4; Some(v)
                  } else None
                val perSample =
                  Seq(0x100, 0x200, 0x400, 0x800).count(f => (trFlags & f) != 0)
                var i = 0
                // a trun whose sizes can't be resolved (no per-sample
                // sizes, no tfhd/trex default) locates nothing — skip it
                // rather than emit wrong offsets. A fully-defaulted
                // trun (perSample == 0) consumes no bytes per
                // iteration, so the per-iteration bounds check can't
                // bound a corrupt sample_count — refuse absurd counts
                // outright (the moov path's tableCap, ~1M entries,
                // applied in refusal form) before they OOM the builder
                val defaultedCountOk = perSample > 0 || n <= (1 << 20)
                while (haveSize && defaultedCountOk && i < n && n >= 0 &&
                    rat + 4L * perSample <= rend) {
                  val dur =
                    if ((trFlags & 0x100) != 0) { val v = be32(b, rat); rat += 4; v }
                    else fallbackDur.getOrElse(0L)
                  val size =
                    if ((trFlags & 0x200) != 0) { val v = be32(b, rat); rat += 4; v }
                    else fallbackSize.get
                  val sflags =
                    if ((trFlags & 0x400) != 0) { val v = be32(b, rat); rat += 4; Some(v) }
                    else if (i == 0 && firstFlags.isDefined) firstFlags
                    else fallbackFlags
                  val cto =
                    if ((trFlags & 0x800) != 0) { val v = be32(b, rat).toInt; rat += 4; v.toLong }
                    else 0L
                  track.foreach { t =>
                    val idx = frameAt.getOrElse(t.streamId, 0)
                    // sample_is_non_sync_sample is bit 16 of the sample
                    // flags; keyframe = its negation, None when no flag
                    // source exists anywhere
                    val keyframe = sflags.map(f => ((f >> 16) & 1L) == 0L)
                    val pts =
                      if (t.timescale > 0 && (haveDur || i == 0))
                        Some((decodeTick + cto) * 1000L / t.timescale)
                      else None
                    if (off >= 0 && size >= 0 && off + size <= b.length) {
                      frag += FrameChunk(docId, idx, t.streamId, t.codec,
                        offset = off, size = size, keyframe = keyframe,
                        pts_ms = pts)
                      frameAt(t.streamId) = idx + 1
                    }
                  }
                  off += size
                  decodeTick += dur
                  i += 1
                }
                cursor = math.max(cursor, off)
              }
              track.foreach(t => nextTick(t.streamId) = decodeTick)
              trafBaseDefault = cursor
            }
          }
        }
        val all = moovSamples ++ frag.result()
        if (all.isEmpty) None else Some(all.toVector)
      }
    } catch { case _: Exception => None }

  /** Real audio decode: header-only sample rate / channels / duration
    * via `javax.sound.sampled.AudioSystem.getAudioFileFormat` — like the
    * image path it parses the container header without decoding samples,
    * the right cost shape for a metadata pass over a large audio corpus.
    * Video FRAME decode stays out of scope (the JDK ships no video
    * codec; a real build would initialize its FFmpeg-style handle in the
    * same mapPartitions slot) — but video container METADATA needs no
    * codec and is parsed for real by [[parseMp4]]/[[parseAvi]].
    */
  private def decodeAudio(docId: Long, bytes: Array[Byte], fmt: String): Option[MediaMeta] =
    try {
      val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val af = ff.getFormat
      val durationMs =
        if (ff.getFrameLength >= 0 && af.getFrameRate > 0)
          Some(math.round(ff.getFrameLength * 1000.0 / af.getFrameRate))
        else None
      Some(MediaMeta(docId, fmt, width = 0, height = 0,
        n_bytes = bytes.length.toLong,
        sample_rate = Some(math.round(af.getSampleRate)),
        channels = Some(af.getChannels),
        duration_ms = durationMs))
    } catch { case _: Exception => None }

  /** Real decode: header-only width/height via `javax.imageio`. The
    * reader parses just the image header — pixels are never allocated,
    * so a metadata pass over billions of images does O(header) work per
    * blob, not O(pixels). Returns None on a corrupt/unsupported stream
    * (caller falls back to the stub, mirroring lenient parse elsewhere).
    */
  private def decodeImage(docId: Long, bytes: Array[Byte], fmt: String): Option[MediaMeta] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          Some(MediaMeta(docId, fmt, r.getWidth(0), r.getHeight(0), bytes.length.toLong))
        } finally r.dispose()
      }
    } catch { case _: Exception => None }
    finally in.close()
  }

  /** STUB DECODER — deterministic fake for payloads that are not real
    * images (the oracle corpus rides document text in the blob column).
    * A production build with audio/video codecs replaces this fallback;
    * the mapPartitions shape stays the same.
    */
  private def decodeFake(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val format = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(docId, format, width = (64 * (1 + n % 16)).toInt,
      height = (64 * (1 + n % 9)).toInt, n_bytes = n)
  }

  private def decodeOne(docId: Long, bytes: Array[Byte]): MediaMeta =
    sniffFormat(bytes)
      .flatMap {
        case fmt @ ("wav" | "aiff") => decodeAudio(docId, bytes, fmt)
        case "mp4"                  => parseMp4(docId, bytes)
        case "avi"                  => parseAvi(docId, bytes)
        case fmt                    => decodeImage(docId, bytes, fmt)
      }
      .getOrElse(decodeFake(docId, bytes))

  /** Batched metadata decode over (doc_id, blob) rows. */
  def decodeMetadata(media: DataFrame): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init: keep ImageIO off its disk-backed
        // stream cache for these small in-memory blobs (a native codec
        // handle would be opened here the same way)
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (docId, bytes) => decodeOne(docId, bytes) }
      }
  }

  /** Resize stub: deterministic downsample of the payload to
    * `targetBytes` by stride sampling — stands in for an image resize
    * while keeping the real shape (binary in, smaller binary out, same
    * mapPartitions batch path a codec-backed resize uses).
    */
  def resize(media: DataFrame, targetBytes: Int): Dataset[(Long, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, bytes) =>
          val out =
            if (bytes.length <= targetBytes) bytes
            else {
              val stride = bytes.length.toDouble / targetBytes
              Array.tabulate(targetBytes)(i => bytes((i * stride).toInt))
            }
          (docId, out)
        }
      }
  }

  /** Frame sampling: REAL frame bytes for uncompressed AVIs (`##db`
    * DIB movi chunks, [[aviUncompressedFrames]] — no codec needed);
    * every other payload (compressed codecs, non-video blobs) keeps the
    * stub path — one "frame" per `frameBytes` slice, the explode-shaped
    * row amplification a real video sampler produces. Frame bytes stay
    * with the row so downstream per-frame decode sees real payloads.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (docId, bytes) =>
        aviUncompressedFrames(docId, bytes).getOrElse {
          bytes.grouped(frameBytes).zipWithIndex.map { case (chunk, i) =>
            Frame(docId, i, chunk)
          }.toVector
        }
      }
  }

  /** Deterministic AVI wrapper for stand-in corpora: splits `payload`
    * into three `00dc` frames (sizes ⌊n/3⌋, ⌊n/3⌋, n−2⌊n/3⌋) inside a
    * movi LIST, with an idx1 index marking frame 0 as the keyframe —
    * enough container structure to drive [[frameChunkIndex]] end to end
    * over a text corpus whose bytes stand in for video. The layout is
    * closed-form (RIFF hdr 12 B, LIST hdr 12 B, 8 B per chunk header,
    * odd sizes pad 1 B), so an SQL oracle can replay every offset.
    */
  def wrapAvi(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val s = n / 3
    val sizes = Array(s, s, n - 2 * s)
    var at = 0
    val frames = sizes.map { sz =>
      val f = java.util.Arrays.copyOfRange(payload, at, at + sz); at += sz; f
    }
    def le(i: Int): Array[Byte] = Array(
      (i & 0xff).toByte, ((i >> 8) & 0xff).toByte,
      ((i >> 16) & 0xff).toByte, ((i >> 24) & 0xff).toByte)
    def chunk(ck: String, p: Array[Byte]): Array[Byte] =
      ck.getBytes("ISO-8859-1") ++ le(p.length) ++ p ++
        (if (p.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    val moviBody = frames.flatMap(f => chunk("00dc", f))
    val movi = "LIST".getBytes("ISO-8859-1") ++ le(4 + moviBody.length) ++
      "movi".getBytes("ISO-8859-1") ++ moviBody
    val idxEntries = Array(0x10, 0, 0).flatMap(fl =>
      "00dc".getBytes("ISO-8859-1") ++ le(fl) ++ le(0) ++ le(0))
    val idx1 = "idx1".getBytes("ISO-8859-1") ++ le(idxEntries.length) ++ idxEntries
    val body = "AVI ".getBytes("ISO-8859-1") ++ movi ++ idx1
    "RIFF".getBytes("ISO-8859-1") ++ le(body.length) ++ body
  }

  /** Per-frame chunk index over (doc_id, blob) rows — the
    * compressed-codec routing path: emits one [[FrameChunk]] per video
    * frame in each AVI or MP4 blob (offsets/sizes/keyframe flags;
    * other blobs emit nothing). A production pipeline joins this
    * against the blob column, slices the keyframes it wants, and ships
    * ONLY those slices to an external decoder — at 100 TB that avoids
    * moving whole videos to decode one sampled frame. Map-side, no
    * shuffle.
    */
  def frameChunkIndex(media: DataFrame): Dataset[FrameChunk] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (docId, bytes) =>
        aviFrameChunkIndex(docId, bytes)
          .orElse(mp4FrameChunkIndex(docId, bytes))
          .getOrElse(Vector.empty)
      }
  }

  // --- audio (WAV/PCM — pure header walk, no codec) -------------------

  /** Minimal canonical WAV writer around raw bytes-as-PCM: RIFF hdr
    * 12 B + "fmt " chunk 24 B + "data" hdr 8 B → samples start at byte
    * 44, data size = payload length (odd sizes RIFF-pad 1 B). Exists so
    * corpora without true audio payloads still drive the REAL parse
    * path with a layout that stays closed-form for a SQL oracle — the
    * [[wrapAvi]] discipline. PCM format tag 1; defaults are 8 kHz mono
    * 16-bit (one sample per 2 payload bytes).
    */
  def wrapWav(payload: Array[Byte], sampleRate: Int = 8000,
              channels: Int = 1, bits: Int = 16): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && bits > 0 && bits % 8 == 0,
      s"bad wav params: rate=$sampleRate ch=$channels bits=$bits")
    def le2(i: Int) = Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte)
    def le4(i: Int) = Array((i & 0xff).toByte, ((i >> 8) & 0xff).toByte,
      ((i >> 16) & 0xff).toByte, ((i >> 24) & 0xff).toByte)
    val blockAlign = channels * bits / 8
    val fmt = "fmt ".getBytes("ISO-8859-1") ++ le4(16) ++ le2(1) ++
      le2(channels) ++ le4(sampleRate) ++ le4(sampleRate * blockAlign) ++
      le2(blockAlign) ++ le2(bits)
    val data = "data".getBytes("ISO-8859-1") ++ le4(payload.length) ++ payload ++
      (if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    val body = "WAVE".getBytes("ISO-8859-1") ++ fmt ++ data
    "RIFF".getBytes("ISO-8859-1") ++ le4(body.length) ++ body
  }

  /** WAV segment index for one blob: the `fmt ` chunk fixes the PCM
    * geometry, then each `data` chunk is cut into `segmentMs` windows —
    * (offset, size) in CONTAINER bytes, (start_ms, n_samples) in global
    * stream time (frames accumulate across data chunks; segments never
    * span a chunk boundary). Lenient like every parser here: not RIFF/
    * WAVE, truncated, non-PCM (format tag ≠ 1), or degenerate geometry
    * → None, never a throw — [[walkRiff]] already stops at any chunk
    * that overruns the buffer, so a truncated header yields however
    * many well-formed chunks precede the cut (fuzz-spec'd).
    */
  private[operators] def wavChunks(
      docId: Long, b: Array[Byte], segmentMs: Long): Option[Vector[AudioChunk]] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE")
      return None
    var fmt: Option[(Int, Int, Int, Int)] = None // tag, channels, rate, bits
    val datas = Vector.newBuilder[(Int, Int)]
    walkRiff(b) { (ck, payload, size, _) =>
      if (ck == "fmt " && size >= 16 && fmt.isEmpty && payload + 16 <= b.length)
        fmt = Some((le16(b, payload), le16(b, payload + 2),
          le32(b, payload + 4).toInt, le16(b, payload + 14)))
      else if (ck == "data") datas += ((payload, size))
    }
    fmt.flatMap { case (tag, channels, rate, bits) =>
      val bytesPerFrame = channels * (bits / 8)
      val framesPerSeg = if (rate > 0) segmentMs * rate / 1000 else 0L
      if (tag != 1 || channels <= 0 || rate <= 0 || bits <= 0 ||
          bits % 8 != 0 || framesPerSeg <= 0) None
      else {
        val out = Vector.newBuilder[AudioChunk]
        var segIdx = 0
        var cumFrames = 0L
        datas.result().foreach { case (payload, size) =>
          val totalFrames = size.toLong / bytesPerFrame
          var f = 0L
          while (f < totalFrames) {
            val n = math.min(framesPerSeg, totalFrames - f)
            out += AudioChunk(docId, segIdx,
              offset = payload + f * bytesPerFrame,
              size = n * bytesPerFrame,
              start_ms = (cumFrames + f) * 1000L / rate,
              n_samples = n * channels,
              sample_rate = rate, channels = channels, bits = bits)
            segIdx += 1
            f += framesPerSeg
          }
          cumFrames += totalFrames
        }
        Some(out.result())
      }
    }
  }

  /** Per-segment WAV index over (doc_id, blob) rows — the audio twin of
    * [[frameChunkIndex]]: one [[AudioChunk]] per 10 ms window (the
    * standard speech-feature hop) per PCM blob; non-WAV blobs emit
    * nothing. A production pipeline joins this against the blob column
    * and slices only the windows it wants — voice-activity gating,
    * silence stripping, feature-extractor sharding — without moving or
    * re-parsing whole recordings. Map-side, no shuffle.
    */
  def wavSampleIndex(media: DataFrame, segmentMs: Long = 10L): Dataset[AudioChunk] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (docId, bytes) =>
        wavChunks(docId, bytes, segmentMs).getOrElse(Vector.empty)
      }
  }

  /** Real PCM decode over the segment index: 16-bit LE samples sliced
    * per [[AudioChunk]] window → (doc_id, segment_index, peak, sum_abs)
    * — the exact-integer level stats a curation pass gates on (silence
    * stripping, clipping detection). Only mono/stereo 16-bit PCM
    * decodes (everything the index emits with bits=16); the arithmetic
    * is pure integers so a SQL oracle can replay it from the payload
    * bytes. Map-side.
    */
  def audioSegmentStats(media: DataFrame, segmentMs: Long = 10L): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (docId, bytes) =>
        wavChunks(docId, bytes, segmentMs).getOrElse(Vector.empty).collect {
          case c if c.bits == 16 =>
            var peak = 0L; var sumAbs = 0L
            var off = c.offset.toInt
            val end = (c.offset + c.size).toInt
            while (off + 1 < end) {
              val s = (le16(bytes, off) << 16 >> 16).toLong // sign-extend
              val a = math.abs(s)
              if (a > peak) peak = a
              sumAbs += a
              off += 2
            }
            (docId, c.segment_index, peak, sumAbs)
        }
      }
      .toDF("doc_id", "segment_index", "peak", "sum_abs")
  }

  // --- image perceptual hashing (dHash) -------------------------------

  /** Minimal 24-bit BMP writer: grayscale pixels (0–255, row-major,
    * TOP-down in `pixels`) become a real decodable bitmap (BMP stores
    * rows bottom-up with 4-byte row padding; r=g=b=value). Exists so
    * corpora without true image payloads can still drive the REAL
    * decode path — [[dHash64]] reads these through javax.imageio like
    * any crawled image — with pixel values that stay closed-form for a
    * SQL oracle.
    */
  def grayBmp(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h)
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize)
    def putLe(off: Int, v: Int, n: Int): Unit =
      (0 until n).foreach(i => out(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    out(0) = 'B'; out(1) = 'M'
    putLe(2, fileSize, 4)           // file size (the sniffer checks it)
    putLe(10, 54, 4)                // pixel data offset
    putLe(14, 40, 4)                // BITMAPINFOHEADER size
    putLe(18, w, 4)
    putLe(22, h, 4)                 // positive height = bottom-up rows
    putLe(26, 1, 2)                 // planes
    putLe(28, 24, 2)                // bits per pixel
    putLe(34, dataSize, 4)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y        // bottom-up
      var x = 0
      while (x < w) {
        val v = (pixels(srcRow * w + x) & 0xff).toByte
        val at = 54 + y * rowBytes + x * 3
        out(at) = v; out(at + 1) = v; out(at + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit difference hash (dHash) of an image blob: decode via
    * javax.imageio, reduce to a 9×8 grayscale grid (integer block
    * average — deterministic, no float resampling), then bit (r·8+c) =
    * 1 iff gray(r,c) > gray(r,c+1). Horizontal-gradient signs survive
    * resizing/recompression, which is what makes dHash a near-dup
    * signature; hamming distance between hashes ≈ perceptual distance.
    * None for blobs no installed reader decodes (the compressed-codec
    * stance everywhere in this file: refuse, don't fake).
    */
  def dHash64(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        if (w < 9 || h < 8) None
        else {
          val g = Array.ofDim[Long](8, 9)
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 9) {
              // block [r·h/8, (r+1)·h/8) × [c·w/9, (c+1)·w/9): integer
              // bounds, exact mean over the block
              val y0 = r * h / 8; val y1 = (r + 1) * h / 8
              val x0 = c * w / 9; val x1 = (c + 1) * w / 9
              var sum = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              g(r)(c) = sum / (3L * (y1 - y0) * (x1 - x0))
              c += 1
            }
            r += 1
          }
          var hash = 0L
          var k = 0
          while (k < 64) {
            if (g(k / 8)(k % 8) > g(k / 8)(k % 8 + 1)) hash |= (1L << k)
            k += 1
          }
          Some(hash)
        }
      }
    } catch { case _: Exception => None }

  /** Per-image dHash signatures over (doc_id, blob) rows — map-side,
    * one decoder init per partition; undecodable blobs drop out. Feed
    * the result to [[graft.operators.Dedup.hammingNearDups]] for the
    * blocked hamming near-dup join (exact recall ≤ 7): hashing is the
    * only pixel-touching step, so a 100 TB image corpus shuffles 16 B
    * signatures, never pixels.
    */
  def imageDHash(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (docId, bytes) =>
          dHash64(bytes).map(h => (docId, h))
        }
      }
      .toDF("doc_id", "dhash")
  }

  /** The end-user routine the chunk index exists for: select keyframes
    * at most one per `everyMs` of presentation time (all keyframes when
    * the container has no timing; every frame when it has no keyframe
    * flags either) and emit their BYTES, sliced from the blob in the
    * same map-side pass — index, filter, and slice never leave the
    * partition, so a 100 TB corpus ships only the selected keyframe
    * payloads (not whole videos) to the downstream decoder fleet.
    */
  def sampleKeyframes(media: DataFrame, everyMs: Long = 10000L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (docId, bytes) =>
        val idx = aviFrameChunkIndex(docId, bytes)
          .orElse(mp4FrameChunkIndex(docId, bytes))
          .getOrElse(Vector.empty)
        val keyframes = idx.filter(_.keyframe.getOrElse(true))
        // interval cursor PER STREAM: pts restarts at 0 for each video
        // track, so one global cursor would suppress every track after
        // the first
        val nextDue = scala.collection.mutable.Map.empty[Int, Long]
        val picked = keyframes.filter { c =>
          c.pts_ms match {
            case Some(t) =>
              if (t >= nextDue.getOrElse(c.stream_id, Long.MinValue)) {
                nextDue(c.stream_id) = t + everyMs; true
              } else false
            case None => true // no timing: keep all keyframes
          }
        }
        // both index parsers emit only in-blob locations; the filter is
        // belt-and-suspenders so a parser bug can never fail the task
        picked
          .filter(c => c.offset >= 0 && c.size >= 0 &&
            c.offset + c.size <= bytes.length)
          .zipWithIndex.map { case (c, i) =>
            Frame(docId, i, java.util.Arrays.copyOfRange(
              bytes, c.offset.toInt, (c.offset + c.size).toInt))
          }
      }
  }
}
