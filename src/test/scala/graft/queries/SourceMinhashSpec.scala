package graft.queries

import graft.SparkTest
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MinHashExpressions
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the group-level MinHash query (q123) and the mergeability
  * property it stands on: MIN distributes over set union, so a
  * signature of a merged shingle set equals the element-wise min of the
  * per-part signatures — for the NATIVE per-doc expression (the
  * production signature path) and for the query's group signature (its
  * estimate must track exact Jaccard on planted overlap fractions).
  */
class SourceMinhashSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("native minhash signatures merge by element-wise min (union = merged parts)") {
    val partA = "alpha beta gamma delta epsilon zeta"
    val partB = "delta epsilon eta theta iota kappa"
    val m = 64
    def sigOf(text: String): Seq[Long] =
      Seq(text).toDF("text")
        .select(MinHashExpressions.minhashSignature(
          TextFunctions.shingleHashes(col("text"), 2), m).as("sig"))
        .collect().head.getSeq[Long](0)
    // the union document carries both parts' shingles (concatenation
    // introduces ONE cross-boundary shingle — use flattened hash arrays
    // instead, the exact union of the two sets)
    val union = Seq((partA, partB)).toDF("a", "b")
      .select(MinHashExpressions.minhashSignature(
        concat(TextFunctions.shingleHashes(col("a"), 2),
          TextFunctions.shingleHashes(col("b"), 2)), m).as("sig"))
      .collect().head.getSeq[Long](0)
    val merged = sigOf(partA).zip(sigOf(partB)).map { case (x, y) => math.min(x, y) }
    assert(union == merged,
      "signature over the union must equal the element-wise min of part signatures")
  }

  test("q123 group signature estimate tracks exact Jaccard on planted overlaps") {
    // two sources sharing exactly half their bigrams: docs are built so
    // the bigram sets are {w_i w_{i+1}} chains over controlled vocab
    def chain(words: Seq[String]) = words.mkString(" ")
    val shared = (0 until 40).map(i => s"s$i")
    val onlyA = (0 until 40).map(i => s"a$i")
    val onlyB = (0 until 40).map(i => s"b$i")
    val docs = Seq(
      (1L, "en", chain(shared), "srcA"), (2L, "en", chain(onlyA), "srcA"),
      (3L, "en", chain(shared), "srcB"), (4L, "en", chain(onlyB), "srcB"))
      .toDF("doc_id", "lang", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("minhash-q123").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueryPack.sourceMinhash(spark, dir)
      .select("src1", "src2", "n_inter", "n_union", "exact_ppm", "est_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (s1, s2, nInter, nUnion, exactPpm, estPpm) = got.head
    assert((s1, s2) == (("srcA", "srcB")))
    // per source: 39 shared-chain bigrams + 39 own-chain bigrams;
    // intersection = the 39 shared, union = 39 + 39 + 39
    assert(nInter == 39L && nUnion == 117L)
    assert(exactPpm == 39L * 1000000L / 117L)
    // m=32 signature: estimate within ±4 matching components (±125000 ppm)
    // of the true 1/3 — loose enough to be deterministic-stable, tight
    // enough to catch a broken seed/min pipeline (which reads 0 or 10^6)
    assert(math.abs(estPpm - 333333L) <= 125000L,
      s"estimate $estPpm ppm implausibly far from exact ${exactPpm} ppm")
  }

  test("q123: disjoint sources estimate ~0, identical sources estimate exactly 10^6") {
    val a = (0 until 30).map(i => s"x$i").mkString(" ")
    val b = (0 until 30).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, "en", a, "s1"), (2L, "en", b, "s2"), (3L, "en", a, "s3"))
      .toDF("doc_id", "lang", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("minhash-q123b").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueryPack.sourceMinhash(spark, dir)
      .select("src1", "src2", "exact_ppm", "est_ppm")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("s1", "s3")) == ((1000000L, 1000000L)),
      "identical shingle sets must match on every signature component")
    assert(got(("s1", "s2"))._1 == 0L)
    assert(got(("s1", "s2"))._2 <= 125000L, "disjoint sets should share ~no components")
    assert(got(("s2", "s3"))._1 == 0L)
  }
}
