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
  * channels, frame count — samples never decoded). Other blobs (the
  * oracle corpus uses document text as a stand-in payload) fall back to
  * a deterministic fake clearly marked below; video stays stubbed (no
  * JDK codec). Everything around the codec call is the real large-scale
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
    else None
  }

  /** Real audio decode: header-only sample rate / channels / duration
    * via `javax.sound.sampled.AudioSystem.getAudioFileFormat` — like the
    * image path it parses the container header without decoding samples,
    * the right cost shape for a metadata pass over a large audio corpus.
    * Video stays stubbed: the JDK ships no video codec, and a real build
    * would initialize its FFmpeg-style handle in the same mapPartitions
    * slot the image/audio decoders use.
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

  /** Frame sampling stub: one "frame" per 256-byte slice of the payload —
    * the explode-shaped row amplification a real video sampler produces.
    * Frame bytes stay with the row so downstream per-frame decode sees
    * real payloads.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .flatMap { case (docId, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex.map { case (chunk, i) =>
          Frame(docId, i, chunk)
        }
      }
  }
}
