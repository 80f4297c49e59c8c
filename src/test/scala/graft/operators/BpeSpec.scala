package graft.operators

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** Bpe.learnMerges contract: the argmax pair each step is the corpus-
  * weighted adjacent-pair count over the CURRENT symbol vocabulary
  * (ties lexicographic on (left, right)), and the vocabulary rewrite is
  * BPE's leftmost-non-overlapping merge — hand-walked on the classic
  * low/lower/newest corpus, plus the overlap and adjacency edge words
  * the two-space `replace` encoding must get right.
  */
class BpeSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("hand-walked merges on the Sennrich-style corpus") {
    // words: low ×3, lower ×2, newest ×4
    val d = docs("low low low", "lower lower", "newest newest", "newest newest")
    val m = Bpe.learnMerges(d, "text", numMerges = 2)
      .orderBy("step").collect()
    // step 1 pair counts: (w,e) = 2 (lower) + 4 (newest) = 6 — the max
    assert(m(0).getInt(0) == 1 && m(0).getString(1) == "w" &&
      m(0).getString(2) == "e" && m(0).getString(3) == "we" &&
      m(0).getLong(4) == 6L)
    // step 2: lower → l o we r, newest → n e we s t;
    // (l,o) = 3 + 2 = 5 beats (n,e)/(e,we)/(we,s)/(s,t) = 4
    assert(m(1).getInt(0) == 2 && m(1).getString(1) == "l" &&
      m(1).getString(2) == "o" && m(1).getLong(4) == 5L)
  }

  test("tie-break is lexicographic on (left, right)") {
    val m = Bpe.learnMerges(docs("ba ba dc dc"), "text", 1).collect()
    assert(m.head.getString(1) == "b" && m.head.getString(2) == "a")
  }

  test("overlapping occurrences merge leftmost-first: aaa + (a,a) -> [aa, a]") {
    val d = docs("aaa")
    val m = Bpe.learnMerges(d, "text", 1).collect()
    assert(m.head.getString(3) == "aa" && m.head.getLong(4) == 2L)
    val v = Bpe.vocabAfter(d, "text", 1).collect()
    assert(v.map(r => (r.getString(0), r.getString(1))).toSet == Set(("aaa", "aa  a")))
  }

  test("adjacent disjoint occurrences both merge: abab + (a,b) -> [ab, ab]") {
    val d = docs("abab abab xab")
    val m = Bpe.learnMerges(d, "text", 1).collect()
    assert(m.head.getString(3) == "ab" && m.head.getLong(4) == 5L)
    val v = Bpe.vocabAfter(d, "text", 1).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(v == Map("ab  ab" -> 2L, "x  ab" -> 1L))
  }

  test("merged symbols participate in later merges (multi-char pairs)") {
    val v = Bpe.vocabAfter(docs("abab abab"), "text", 2).collect()
    assert(v.map(_.getString(1)).toSet == Set("abab"))
  }

  test("deterministic across partitionings") {
    val d = docs("low low low", "lower lower", "newest newest", "newest newest")
    val a = Bpe.learnMerges(d, "text", 3).collect().toSeq
    val b = Bpe.learnMerges(d.repartition(7), "text", 3).collect().toSeq
    assert(a == b)
  }

  test("single-character and empty words contribute no pairs") {
    val m = Bpe.learnMerges(docs("a b c d", "  ", "xy xy"), "text", 1).collect()
    assert(m.head.getString(3) == "xy" && m.head.getLong(4) == 2L)
  }

  test("lineage checkpoint is semantics-free: every-step checkpoint == none") {
    // checkpointEvery = 1 truncates the plan after EVERY merge — the
    // two-space replace invariant must survive each materialization
    // boundary (symbols re-read from checkpointed rows, not the lazy
    // replace chain). Compare against an interval the 4-merge run never
    // reaches.
    val d = docs("low low low", "lower lower", "newest newest", "newest newest")
    val every = Bpe.learnMerges(d, "text", 4, checkpointEvery = 1)
      .orderBy("step").collect().toSeq
    val never = Bpe.learnMerges(d, "text", 4, checkpointEvery = 1000)
      .orderBy("step").collect().toSeq
    assert(every == never && every.size == 4)
    val va = Bpe.vocabAfter(d, "text", 4, checkpointEvery = 1)
      .orderBy("w").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val vb = Bpe.vocabAfter(d, "text", 4, checkpointEvery = 1000)
      .orderBy("w").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(va == vb)
  }

  test("merge exhaustion stops early and returns only attainable steps") {
    // 'ab' has exactly 1 learnable pair; steps 2..5 have no pairs left
    val m = Bpe.learnMerges(docs("ab ab ab"), "text", 5).collect()
    assert(m.length == 1 && m.head.getString(3) == "ab")
    val v = Bpe.vocabAfter(docs("ab ab ab"), "text", 5).collect()
    assert(v.map(_.getString(1)).toSet == Set("ab"))
  }

  test("encodeWith applies FROZEN rules to held-out text (q146's serve path)") {
    // train learns (a,b) then (ab,ab); held-out rules are fixed:
    // 'abab' collapses fully, 'abba' gets one ab ('b  b' was never
    // learned even though it's held-out-frequent — frozen means frozen),
    // unseen 'xyz' segments to characters
    val train = docs("abab abab abab")
    val m = Bpe.learnMerges(train, "text", 2).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    assert(m == Seq("a" -> "b", "ab" -> "ab"))
    val enc = Bpe.encodeWith(docs("abab abba abba abba xyz"), "text", m)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(enc == Map(
      "abab" -> ("abab", 1L),
      "abba" -> ("ab  b  a", 3L),
      "xyz" -> ("x  y  z", 1L)))
  }

  test("vocabAfter == learn-then-encodeWith on the same corpus") {
    val d = docs("low low low", "lower lower", "newest newest")
    val viaVocab = Bpe.vocabAfter(d, "text", 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val m = Bpe.learnMerges(d, "text", 3).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val viaEncode = Bpe.encodeWith(d, "text", m).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(viaVocab == viaEncode)
  }
}
