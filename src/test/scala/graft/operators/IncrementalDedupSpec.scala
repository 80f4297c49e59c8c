package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** incrementalNearDups contract: an arriving batch probed against the
  * persisted corpus index finds exactly the pairs a full re-dedup of
  * corpus+batch would attribute to the batch — corpus matches, batch-
  * internal matches once with id the LATER (higher) doc — the keep-first
  * admission orientation — nothing self-paired, nothing
  * corpus-internal (the standing corpus is NOT re-checked; that is the
  * operator's cost contract).
  */
class IncrementalDedupSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val existing = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "completely different corpus content about spark engines"),
    (3L, "another unrelated document mentioning distributed joins here")
  ).toDF("doc_id", "text")

  // 10 ≈ copy of 1 (near-dup vs corpus); 11 & 12 near-dup of each other;
  // 13 clean; 14 empty (no shingles)
  private val batch = Seq(
    (10L, "the quick brown fox jumps over the lazy dog now"),
    (11L, "fresh batch text repeated fresh batch text repeated often"),
    (12L, "fresh batch text repeated fresh batch text repeated again"),
    (13L, "totally novel content sharing nothing with anything else"),
    (14L, "")
  ).toDF("doc_id", "text")

  private def run(b: org.apache.spark.sql.DataFrame = batch) = {
    val idx = Dedup.minhashBandIndex(existing, "doc_id", "text", 64, 16, 2)
    val sets = Dedup.shingleHashSets(existing, "doc_id", "text", 2)
    Dedup.incrementalNearDups(b, "doc_id", "text", idx, sets,
      numHashes = 64, bands = 16, shingleSize = 2, jaccardThreshold = 0.5)
  }

  test("corpus match, batch-internal match, clean and empty docs") {
    val pairs = run().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(pairs == Set((10L, 1L, "corpus"), (12L, 11L, "batch")))
  }

  test("agrees with full-corpus nearDuplicatePairs restricted to batch-involved pairs") {
    val full = Dedup.nearDuplicatePairs(existing.unionByName(batch),
        "doc_id", "text", numHashes = 64, bands = 16, shingleSize = 2,
        jaccardThreshold = 0.5)
      .filter(col("id_a") >= 10 || col("id_b") >= 10)
      .select(least(col("id_a"), col("id_b")), greatest(col("id_a"), col("id_b")),
        col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = run().collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    assert(inc == full)
  }

  test("batch-internal pairs emit once, keep-first (id > match_id); no self pairs") {
    val rows = run().collect()
    rows.foreach { r =>
      assert(r.getLong(0) != r.getLong(1))
      // keep-first: the flagged (left) side is the LATER arrival, so the
      // per-id rollup admits the first occurrence and drops the duplicate
      if (r.getString(3) == "batch") assert(r.getLong(0) > r.getLong(1))
      assert(r.getLong(0) >= 10L, "left side is always a batch doc")
    }
  }

  test("appendToIndex closes the loop: arrival B finds its dups against admitted arrival A") {
    val work = java.nio.file.Files.createTempDirectory("incrdedup").toString
    val bandDir = s"$work/bands"; val setsDir = s"$work/sets"
    // persist the standing corpus's artifacts (the one-time build)
    Dedup.minhashBandIndex(existing, "doc_id", "text", 64, 16, 2)
      .write.parquet(bandDir)
    Dedup.shingleHashSets(existing, "doc_id", "text", 2).write.parquet(setsDir)
    def probe(b: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalNearDups(b, "doc_id", "text",
        spark.read.parquet(bandDir), spark.read.parquet(setsDir),
        64, 16, 2, 0.5)
    // arrival A: 20 duplicates corpus doc 1 (REJECTED), 21 is novel (ADMITTED)
    val arrivalA = Seq(
      (20L, "the quick brown fox jumps over the lazy dog today"),
      (21L, "entirely new material arriving in the first ingest wave")
    ).toDF("doc_id", "text")
    val pairsA = probe(arrivalA)
    val dupA = pairsA.select(col("id")).distinct()
    val admittedA = arrivalA.join(dupA, arrivalA("doc_id") === dupA("id"), "left_anti")
    assert(admittedA.collect().map(_.getLong(0)).toSet == Set(21L))
    Dedup.appendToIndex(admittedA, "doc_id", "text", bandDir, setsDir, 64, 16, 2)
    // arrival B: 30 near-dups A's ADMITTED doc 21 — must be found as a
    // CORPUS match now; 31 near-dups A's REJECTED doc 20 — 20 was never
    // admitted, so 31 must only match 20's surviving twin (corpus doc 1)
    val arrivalB = Seq(
      (30L, "entirely new material arriving in the first ingest rush"),
      (31L, "the quick brown fox jumps over the lazy dog forever")
    ).toDF("doc_id", "text")
    val pairsB = probe(arrivalB).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(pairsB == Set((30L, 21L, "corpus"), (31L, 1L, "corpus")),
      s"got $pairsB")
  }

  test("probe cost is batch-shaped: corpus-internal dups are not re-found") {
    val dupCorpus = existing.unionByName(Seq(
      (4L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")) // 4 duplicates 1 INSIDE the corpus
    val idx = Dedup.minhashBandIndex(dupCorpus, "doc_id", "text", 64, 16, 2)
    val sets = Dedup.shingleHashSets(dupCorpus, "doc_id", "text", 2)
    val pairs = Dedup.incrementalNearDups(batch, "doc_id", "text", idx, sets,
      64, 16, 2, 0.5).collect()
    // (1,4) is a corpus-internal pair: must NOT appear; batch doc 10
    // now matches BOTH corpus copies
    assert(!pairs.exists(r => r.getLong(0) == 1L || r.getLong(0) == 4L))
    assert(pairs.count(r => r.getLong(0) == 10L) == 2)
  }
}
