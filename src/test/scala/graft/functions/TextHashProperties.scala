package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.TextHashOps
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** TextHashOps against independent reference implementations. */
object TextHashProperties extends Properties("TextHashOps") {

  /** Straight-line FNV-1a re-implementation (BigInt modular arithmetic —
    * the same formulation the DuckDB oracle SQL uses).
    */
  private def fnvReference(s: String): Long = {
    val mod = BigInt(1) << 64
    var h = BigInt("14695981039346656037")
    s.codePoints().toArray.foreach { cp =>
      h = ((h ^ BigInt(cp)) * BigInt("1099511628211")).mod(mod)
    }
    h.longValue
  }

  property("fnv64 equals the modular-arithmetic reference") =
    forAll(Gen.asciiPrintableStr) { s =>
      TextHashOps.fnv64(UTF8String.fromString(s)) == fnvReference(s)
    }

  property("fnv64 handles non-ascii codepoints identically") =
    forAll(Gen.listOf(Gen.oneOf("é", "λ", "嗨", "🙂", "a"))) { parts =>
      val s = parts.mkString
      TextHashOps.fnv64(UTF8String.fromString(s)) == fnvReference(s)
    }

  private def simhashReference(hashes: Seq[Long]): Long =
    (0 until 64).foldLeft(0L) { (sig, b) =>
      val votes = hashes.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
      if (votes > 0) sig | (1L << b) else sig
    }

  property("simhash64 equals the per-bit fold reference") =
    forAll(Gen.listOf(Gen.long)) { hs =>
      TextHashOps.simhash64(ArrayData.toArrayData(hs.toArray)) == simhashReference(hs)
    }

  property("simhash64 of identical multisets is permutation-invariant") =
    forAll(Gen.nonEmptyListOf(Gen.long)) { hs =>
      val shuffled = scala.util.Random.shuffle(hs)
      TextHashOps.simhash64(ArrayData.toArrayData(hs.toArray)) ==
        TextHashOps.simhash64(ArrayData.toArrayData(shuffled.toArray))
    }
}
