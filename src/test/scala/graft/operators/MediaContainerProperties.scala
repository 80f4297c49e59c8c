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

  // ---- parser fuzzing: a 100 TB corpus WILL contain corrupt blobs; a
  // single throw in the map-side parse fails the whole task, so both
  // index parsers must return None/empty on ANY input ---------------

  private val junkGen: Gen[Array[Byte]] =
    Gen.oneOf(
      // pure noise
      payloadGen,
      // noise behind a valid magic: forces the parser past the sniff
      payloadGen.map(p => "RIFF1234AVI ".getBytes("ISO-8859-1") ++ p),
      payloadGen.map(p =>
        Array[Byte](0, 0, 0, 16) ++ "ftypisom0000".getBytes("ISO-8859-1") ++ p))

  property("index parsers never throw on arbitrary bytes") =
    forAll(junkGen) { junk =>
      Media.aviFrameChunkIndex(1L, junk)
      Media.mp4FrameChunkIndex(1L, junk)
      Media.aviUncompressedFrames(1L, junk)
      true
    }

  property("index parsers never throw on truncations of a valid container") =
    forAll(payloadGen, Gen.chooseNum(0.0, 1.0)) { (p, frac) =>
      val blob = Media.wrapAvi(p)
      val cut = java.util.Arrays.copyOf(blob, (blob.length * frac).toInt)
      Media.aviFrameChunkIndex(1L, cut)
      Media.aviUncompressedFrames(1L, cut)
      true
    }

  property("truncated containers yield a subset of the full index") =
    forAll(payloadGen, Gen.chooseNum(0.0, 1.0)) { (p, frac) =>
      val blob = Media.wrapAvi(p)
      val cut = java.util.Arrays.copyOf(blob, (blob.length * frac).toInt)
      val full = Media.aviFrameChunkIndex(1L, blob).getOrElse(Vector.empty)
        .map(c => (c.offset, c.size)).toSet
      val part = Media.aviFrameChunkIndex(1L, cut).getOrElse(Vector.empty)
        .map(c => (c.offset, c.size)).toSet
      part.subsetOf(full) // never an invented frame location
    }
}
