package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect().head.getAs[T]("v")

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): List[String] =
    Seq(text).toDF("text").select(c.as("v")).collect().head.getSeq[String](0).toList

  test("tokens: empty and whitespace-only strings produce empty arrays") {
    assert(oneSeq(TextFunctions.tokens($"text"), "a  b\tc") == List("a", "b", "c"))
    assert(oneSeq(TextFunctions.tokens($"text"), "") == Nil)
    assert(oneSeq(TextFunctions.tokens($"text"), "   ") == Nil)
  }

  test("hashedLinearScore: hand-walked mean bucket weight, empty doc scores 0") {
    import org.apache.spark.sql.graft.TextHashOps
    import org.apache.spark.unsafe.types.UTF8String
    val w = TextFunctions.ClassifierWeights
    assert(w.size == 64 && w.forall(x => x >= -1.0 && x < 1.0))
    assert(w.forall(x => (x * 1000).round / 1000.0 == x), "exact 1e-3 multiples")
    // left-fold order pinned: ((0 + w[b1]) + w[b2]) + w[b3], then / 3
    val toks = Seq("the", "quick", "fox")
    val expected = toks.foldLeft(0.0)((acc, t) =>
      acc + w((TextHashOps.fnv64(UTF8String.fromString(t)) & 63L).toInt)) / toks.size
    assert(one[Double](TextFunctions.hashedLinearScore($"text"), toks.mkString(" "))
      == expected)
    assert(one[Double](TextFunctions.hashedLinearScore($"text"), "") == 0.0)
    assert(one[Double](TextFunctions.hashedLinearScore($"text"), "   ") == 0.0)
    // tab-padded text survives trim (space-only, both engines) and scores
    // the empty-field token — pinned so the oracle twin stays honest
    val emptyTokScore =
      w((TextHashOps.fnv64(UTF8String.fromString("")) & 63L).toInt)
    assert(one[Double](TextFunctions.hashedLinearScore($"text"), "  \t ")
      == emptyTokScore)
  }

  test("positional window hashes equal fnv64 of the string windows, position by position") {
    import org.apache.spark.sql.graft.{ShingleExpressions, TextHashExpressions}
    // edge zoo: multi-space runs, tab/newline separators (empty edge
    // fields), non-BMP codepoints, short docs, whitespace-only
    val cases = Seq("a b c d e", "a  b\tc\nd", "\ta b c", "a b c\t",
      "héllo wörld again", "one two", "one", "", "   ", "x \t y z 𝄞clef w")
    for (t <- cases; n <- Seq(2, 3)) {
      val df = Seq(t).toDF("text")
      val native = df.select(explode(
          ShingleExpressions.positionalWindowHashes(col("text"), n)).as("wh"))
        .select(col("wh.pos"), col("wh.hash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaString = df.select(posexplode(
          TextFunctions.shingles(col("text"), n)).as(Seq("pos", "win")))
        .select(col("pos").cast("long"),
          TextHashExpressions.fnv64(col("win")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native === viaString,
        s"divergence on '${t.replace("\t", "\\t").replace("\n", "\\n")}' n=$n")
    }
  }

  test("native token_count equals size(split) on edge cases") {
    val cases = Seq("", "   ", "one", " a  b\tc\nd ", "ab\fc\rd",
      "héllo wörld", "a", "  leading", "trailing  ", "\t\n", "a.b,c d",
      "\ta", "a\t", " \t a \t ", "ab")
    for (t <- cases) {
      val native = one[Int](TextFunctions.tokenCount(col("text")), t)
      val regex = one[Int](
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), "\\s+"))), t)
      assert(native == regex, s"mismatch on ${t.replace("\n", "\\n")}")
    }
  }

  test("native normalize_ws_punct equals the regex normalization") {
    import org.apache.spark.sql.graft.TextNormExpressions
    val cases = Seq("", "...", "a..b", "Hello, World!  How are--you?",
      "  (padded)  ", "tabs\there\tnow", "unicode: héllo—wörld", "a", "!a!")
    for (t <- cases) {
      val native = one[String](TextNormExpressions.normalizeWsPunct(col("text")), t)
      val regex = one[String](
        trim(regexp_replace(col("text"), "[\\p{Punct}\\s]+", " ")), t)
      assert(native == regex, s"mismatch on '$t': '$native' vs '$regex'")
    }
  }

  test("mean word length and subword count") {
    assert(one[Double](TextFunctions.meanWordLength($"text"), "ab cdef") == 3.0)
    assert(one[Double](TextFunctions.meanWordLength($"text"), "") == 0.0)
    // "don't stop!" → [don]['][t][stop][!] = 5 pieces
    assert(one[Int](TextFunctions.subwordCount($"text"), "don't stop!") == 5)
    assert(one[Int](TextFunctions.subwordCount($"text"), "a1b") == 3)
  }

  test("greedy BPE tokenizer: hand-verified segmentations and invariants") {
    def bpe(t: String): Long = one[Long](TextFunctions.bpeTokenCount($"text"), t)
    // hand-walked greedy longest-match over BpeVocab:
    assert(bpe("table") == 2)   // ta|ble
    assert(bpe("stream") == 2)  // st|ream
    assert(bpe("window") == 3)  // w|in|dow
    assert(bpe("value") == 2)   // val|ue
    assert(bpe("scan") == 2)    // sc|an
    assert(bpe("a") == 1)       // single-char fallback
    assert(bpe("xyzq") == 4)    // nothing matches: all 1-char pieces
    assert(bpe("") == 0)
    assert(bpe("   ") == 0)
    assert(bpe("table stream") == 4) // per-word sums
    // greedy is position-committed: "ta" consumes positions 1–2, so the
    // "an" piece at position 2 is never considered
    assert(bpe("tangent") == 6) // ta|n|g|e|n|t
    // invariants: ≥ word count (every word yields ≥1), ≤ char count
    val texts = Seq("the quick brown fox", "data table stream scan scan",
      "merge order value window column")
    for (t <- texts) {
      val n = bpe(t)
      val words = t.trim.split("\\s+").length
      assert(n >= words && n <= t.replace(" ", "").length, s"bounds on '$t'")
    }
  }

  test("quality score stays in [0,1] and rewards clean prose") {
    val clean = "the quick brown fox jumps over the lazy dog and runs on for a while longer"
    val junk = "!!! ??? ### $$$ %%%"
    val qClean = one[Double](TextFunctions.qualityScore($"text"), clean)
    val qJunk = one[Double](TextFunctions.qualityScore($"text"), junk)
    assert(qClean >= 0.0 && qClean <= 1.0 && qJunk >= 0.0 && qJunk <= 1.0)
    assert(qClean > qJunk)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val ab = one[Long](TextFunctions.fingerprint($"text"), "alpha beta")
    val ba = one[Long](TextFunctions.fingerprint($"text"), "beta alpha")
    assert(ab != ba)
    assert(ab == one[Long](TextFunctions.fingerprint($"text"), "alpha beta"))
  }

  test("shingles slide over tokens; short docs have no n-gram shingles") {
    assert(oneSeq(TextFunctions.shingles($"text", 2), "a b c") == List("a b", "b c"))
    assert(oneSeq(TextFunctions.shingles($"text", 3), "a b") == Nil)
    assert(oneSeq(TextFunctions.shingles($"text", 2), "") == Nil)
  }

  test("shingleHashes: sorted-distinct, order-sensitive, short docs empty") {
    def hs(text: String, n: Int): List[Long] =
      Seq(text).toDF("text")
        .select(TextFunctions.shingleHashes($"text", n).as("v"))
        .collect().head.getSeq[Long](0).toList
    val abc = hs("a b c", 2)
    assert(abc.length == 2 && abc == abc.sorted && abc.distinct == abc)
    // shingle identity is the token sequence, not the bag
    assert(hs("a b", 2) != hs("b a", 2))
    // duplicate shingles collapse: "a b a b" has shingles {a b, b a}
    assert(hs("a b a b", 2).length == 2)
    assert(hs("a", 2) == Nil && hs("", 2) == Nil && hs("   ", 2) == Nil)
    // whitespace runs count as one separator, like tokens()
    assert(hs("a  \t b", 2) == hs("a b", 2))
  }

  test("shingleHashes agrees with the string-shingle path on edge cases") {
    // hash-set cardinality must equal the distinct string-shingle count
    // for every tokenization quirk: edge empty fields ("\ta" has tokens
    // ["", "a"]), ASCII-only \s (U+3000 is NOT a separator), surrogates
    def nHashes(text: String, n: Int): Int =
      Seq(text).toDF("text")
        .select(size(TextFunctions.shingleHashes($"text", n)).as("v"))
        .collect().head.getInt(0)
    def nStrings(text: String, n: Int): Int =
      Seq(text).toDF("text")
        .select(size(array_distinct(TextFunctions.shingles($"text", n))).as("v"))
        .collect().head.getInt(0)
    val cases = Seq("\ta", "a\t", "\ta b\t", " \t a", "a\u3000b", "a \u3000 b",
      "x🙂 y🙂 x🙂", "a  b", "\t\n", "a b a b", "", "   ")
    for (t <- cases; n <- Seq(1, 2, 3)) {
      assert(nHashes(t, n) == math.max(nStrings(t, n), 0),
        s"cardinality mismatch on '${t.replace("\t", "\\t").replace("\n", "\\n")}' n=$n")
    }
    // equal token sequences ⇒ equal hash sets, across separator styles
    assert(hsList("\ta b", 2) == hsList("\u000B\u000Ba  b", 2))
    // U+3000 is inside the token, so these differ
    assert(hsList("a\u3000b c", 2) != hsList("a b c", 2))
  }

  private def hsList(text: String, n: Int): List[Long] =
    Seq(text).toDF("text")
      .select(TextFunctions.shingleHashes($"text", n).as("v"))
      .collect().head.getSeq[Long](0).toList

  test("langIdMarkers follows first-match priority") {
    assert(one[String](TextFunctions.langIdMarkers($"text"), "der hund und die katze") == "de")
    assert(one[String](TextFunctions.langIdMarkers($"text"), "the cat and the dog") == "en")
    assert(one[String](TextFunctions.langIdMarkers($"text"), "xyzzy qwerty") == "und")
    // de markers win over later en markers
    assert(one[String](TextFunctions.langIdMarkers($"text"), "und the") == "de")
  }
}
