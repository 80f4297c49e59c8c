package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata extracted by a partition-mapped decoder.
  *
  * The decode step itself is a STUB — this container ships no image/audio
  * codecs — substituted by a deterministic fake derived from the payload
  * size (clearly marked below). Everything around it is the real
  * large-scale shape: binary column + schema, `mapPartitions` batch
  * decode (one decoder instance per partition, not per row — exactly
  * where a JNI/FFmpeg/JPEG library would be initialized), explode for
  * frame sampling, and aggregation over the typed metadata.
  */
object Media {

  final case class MediaMeta(
      doc_id: Long, format: String, width: Int, height: Int, n_bytes: Long)

  final case class Frame(doc_id: Long, frame_index: Int, frame_bytes: Array[Byte])

  /** Attach the binary payload column. With no true media corpus in the
    * testdata, document text stands in as the blob — the schema and
    * execution path are identical for real image bytes.
    */
  def attachBlob(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("blob", col(textCol).cast("binary"))

  /** STUB DECODER — deterministic fake in place of a real image decode.
    * A production build replaces the body of `decodeOne` with the codec
    * call; the mapPartitions shape (per-partition init, batched iterator)
    * stays the same.
    */
  private def decodeOne(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val format = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(docId, format, width = (64 * (1 + n % 16)).toInt,
      height = (64 * (1 + n % 9)).toInt, n_bytes = n)
  }

  /** Batched metadata decode over (doc_id, blob) rows. */
  def decodeMetadata(media: DataFrame): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (native lib handle)
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
