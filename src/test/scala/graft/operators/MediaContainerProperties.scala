package graft.operators

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** wrapAvi ∘ aviFrameChunkIndex roundtrip over arbitrary payloads: the
  * closed-form container layout the q82 oracle replays must hold for
  * EVERY byte string, not just corpus text — offsets absolute and
  * strictly increasing, slices reconstructing the payload exactly, and
  * the idx1 keyframe pattern stable. Pure JVM (no Spark session), so
  * shrinking works on raw byte arrays.
  */
object MediaContainerProperties extends Properties("MediaContainer") {

  private val payloadGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte)))

  private def index(p: Array[Byte]) =
    Media.aviFrameChunkIndex(7L, Media.wrapAvi(p)).getOrElse(Vector.empty)

  property("three frames whose slices reconstruct the payload in order") =
    forAll(payloadGen) { p =>
      val blob = Media.wrapAvi(p)
      val idx = index(p)
      val rebuilt = idx.sortBy(_.frame_index).flatMap(c =>
        blob.slice(c.offset.toInt, (c.offset + c.size).toInt))
      idx.length == 3 && rebuilt == p.toVector
    }

  property("offsets match the closed form the q82 oracle replays") =
    forAll(payloadGen) { p =>
      val s = p.length / 3
      val pad = s % 2
      val expected = Vector(32L, 40L + s + pad, 48L + 2L * (s + pad))
      index(p).sortBy(_.frame_index).map(_.offset) == expected
    }

  property("exactly frame 0 is the keyframe; all chunks are stream-0 dc") =
    forAll(payloadGen) { p =>
      val idx = index(p).sortBy(_.frame_index)
      idx.map(_.keyframe) == Vector(Some(true), Some(false), Some(false)) &&
        idx.forall(c => c.stream_id == 0 && c.codec_kind == "dc")
    }

  property("uncompressed-frame extraction ignores wrapAvi's dc chunks") =
    forAll(payloadGen) { p =>
      // ##dc payloads need a codec: the frame DECODER must not claim them
      Media.aviUncompressedFrames(7L, Media.wrapAvi(p)).isEmpty
    }
}
