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

  // ---- TextNormOps against the regex formulations they replace ----

  /** Strings biased toward whitespace/punct runs and non-ASCII. */
  private val messyStr: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("\t"),
      Gen.const("\n"), Gen.const("\u000B"), Gen.const("\f"), Gen.const("\r"),
      Gen.oneOf(".", ",", "!", "?", "-", "_", "(", ")", "'", "\"", "/", "@"),
      Gen.oneOf("é", "ß", "嗨", "🙂"))).map(_.mkString)

  /** Reference: the exact regex pipeline tokenCount replaced —
    * space-only trim, then `\s+` split keeping empty edge fields.
    */
  private def tokenCountReference(s: String): Int = {
    var st = 0; var en = s.length
    while (st < en && s.charAt(st) == ' ') st += 1
    while (en > st && s.charAt(en - 1) == ' ') en -= 1
    val t = s.substring(st, en)
    if (t.isEmpty) 0 else t.split("\\s+", -1).length
  }

  property("tokenCount equals the split-field regex reference") =
    forAll(messyStr) { s =>
      org.apache.spark.sql.graft.TextNormOps.tokenCount(
        UTF8String.fromString(s)) == tokenCountReference(s)
    }

  property("normalizeWsPunct equals trim(regexp_replace([punct ws]+, ' '))") =
    forAll(messyStr) { s =>
      org.apache.spark.sql.graft.TextNormOps.normalizeWsPunct(
        UTF8String.fromString(s)).toString ==
        s.replaceAll("[\\p{Punct}\\s]+", " ").trim
    }

  /** Ascending-distinct output on ARBITRARY text is the soundness
    * precondition of IntersectCountRewrite (and of every sorted-merge
    * verify in the dedup family) — pinned here beyond the fixed-case
    * spec in TextFunctionsSpec.
    */
  property("shingleHashes output is ascending-distinct on arbitrary text") =
    forAll(messyStr, Gen.choose(1, 4)) { (s, n) =>
      val arr = org.apache.spark.sql.graft.ShingleOps.shingleHashes(
        UTF8String.fromString(s), n)
      val longs = (0 until arr.numElements()).map(arr.getLong)
      longs == longs.distinct.sorted
    }
}
