package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{SketchAggregates, TextHashExpressions, TextHashOps}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The KMV sketch's contract: a bounded mergeable buffer whose result
  * is EXACTLY "the k smallest distinct hashes in unsigned order" — so
  * the aggregate must be invariant to partitioning (merge
  * associativity), exact below k, and match a driver-side replay of the
  * same definition above k.
  */
class KmvSketchSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(explode(TextFunctions.tokens($"text")).as("t"))
      .agg(SketchAggregates.kmvSketch(
        TextHashExpressions.mix64(TextHashExpressions.fnv64($"t")), k).as("sk"))
      .select($"sk.n", $"sk.kth").collect().head

  test("mix64 equals the hugeint split-multiply form the oracle replays") {
    // the SQL twin (SqlTwins.mixSql) can't multiply two 64-bit values in
    // HUGEINT directly; it splits the multiplier. Pin that algebra equal
    // to the JVM's wrapping-long splitmix64 across the value range.
    def mulMod64(z: BigInt, m: BigInt): BigInt = {
      val mLo = m & 0xFFFFFFFFL; val mHi = m >> 32
      (z * mLo + ((z % 4294967296L) * mHi % 4294967296L) * 4294967296L) %
        (BigInt(1) << 64)
    }
    def sqlForm(x: BigInt): BigInt = {
      val mod = BigInt(1) << 64
      val z1 = (x + BigInt("11400714819323198485")) % mod
      val x1 = z1 ^ (z1 >> 30)
      val z2 = mulMod64(x1, BigInt("13787848793156543929"))
      val x2 = z2 ^ (z2 >> 27)
      val z3 = mulMod64(x2, BigInt("10723151780598845931"))
      z3 ^ (z3 >> 31)
    }
    val rng = new scala.util.Random(7)
    val samples = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue) ++
      Seq.fill(2000)(rng.nextLong())
    samples.foreach { v =>
      val unsigned = BigInt(java.lang.Long.toUnsignedString(v))
      val expected = sqlForm(unsigned)
      val got = BigInt(java.lang.Long.toUnsignedString(TextHashOps.mix64(v)))
      assert(got == expected, s"mix64($v)")
    }
  }

  test("kmv sketch equals the driver-side k-smallest-unsigned replay") {
    val toks = docs.select(explode(TextFunctions.tokens($"text")).as("t"))
      .collect().map(_.getString(0))
    val hashes = toks.map(t =>
        TextHashOps.mix64(TextHashOps.fnv64(UTF8String.fromString(t))))
      .distinct.sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
    for (k <- Seq(16, 64, 256)) {
      val row = sketch(docs, k)
      val expected = hashes.take(k)
      assert(row.getInt(0) == expected.length, s"k=$k buffer size")
      assert(row.getLong(1) == expected.last, s"k=$k kth minimum")
    }
  }

  test("kmv sketch is partition-invariant (merge associativity)") {
    val base = sketch(docs, 64)
    for (p <- Seq(1, 7, 32)) {
      val row = sketch(docs.repartition(p), 64)
      assert(row.getInt(0) == base.getInt(0) && row.getLong(1) == base.getLong(1),
        s"sketch must not depend on partitioning (p=$p)")
    }
  }

  test("kmv sketch is exact below k and estimates within 30% above it") {
    // exact regime: a tiny distinct set with k far above it
    val tiny = Seq("a b c", "a b", "c d").toDF("text")
    val row = tiny.select(explode(TextFunctions.tokens($"text")).as("t"))
      .agg(SketchAggregates.kmvSketch(TextHashExpressions.fnv64($"t"), 64).as("sk"))
      .select($"sk.n").collect().head
    assert(row.getInt(0) == 4, "below k the sketch IS the distinct count")
    // estimate regime needs a vocabulary well above k; the synthetic
    // corpora top out at 31 distinct tokens (every sf — the generator
    // uses a fixed word list), so the >k leg synthesizes 5000 distinct
    // tokens. Deterministic hashing makes the estimate a fixed number —
    // this asserts a measured property, not a probabilistic one.
    val exact = 5000L
    val wide = spark.range(exact).select(concat(lit("tok"), $"id").as("text"))
    val sk = sketch(wide, 64)
    assert(sk.getInt(0) == 64, "synthetic vocab must exceed k")
    val kthU = { val h = sk.getLong(1)
      if (h < 0) h.toDouble + math.pow(2, 64) else h.toDouble }
    val est = math.floor(63.0 * math.pow(2, 64) / kthU)
    // raw fnv64 on these sequential keys estimated 174,749 (35× off —
    // the measurement that motivated mix64); with the finalizer the
    // estimate is a fixed deterministic number inside the k=64 band
    assert(math.abs(est - exact) / exact.toDouble < 0.30,
      s"KMV estimate $est vs exact $exact outside the k=64 error band")
  }

  // ------------------------------------------------ sketch-table re-roll
  private def hashCol = TextHashExpressions.mix64(TextHashExpressions.fnv64($"t"))

  test("kmv_union over stored kmv_hashes equals kmv_sketch over the raw rows") {
    val toks = docs.select($"source",
      explode(TextFunctions.tokens($"text")).as("t"))
    for (k <- Seq(8, 16, 64)) {
      val direct = toks
        .agg(SketchAggregates.kmvSketch(hashCol, k).as("sk"))
        .select($"sk.n", $"sk.kth").collect().head
      val rerolled = toks
        .groupBy($"source")
        .agg(SketchAggregates.kmvHashes(hashCol, k).as("hs"))
        .agg(SketchAggregates.kmvUnion($"hs", k).as("sk"))
        .select($"sk.n", $"sk.kth").collect().head
      assert(rerolled == direct,
        s"k=$k: union of per-source sketches must be bit-equal to the direct sketch")
    }
  }

  test("kmv_hashes is bounded by k, unsigned-ascending, distinct") {
    val rows = docs.select(explode(TextFunctions.tokens($"text")).as("t"))
      .agg(SketchAggregates.kmvHashes(hashCol, 16).as("hs"))
      .select($"hs").collect().head.getSeq[Long](0)
    assert(rows.length == 16)
    assert(rows.distinct.length == rows.length)
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(java.lang.Long.compareUnsigned(a, b) < 0, "ascending unsigned order")
    }
  }

  test("kmv_union re-rolls stored k=64 sketches down to a valid k=8 summary") {
    // coarser re-roll: stored wide sketches answer narrower-k queries —
    // the k=8 summary from k=64 arrays equals the direct k=8 sketch
    val toks = docs.select($"source", explode(TextFunctions.tokens($"text")).as("t"))
    val direct = toks.agg(SketchAggregates.kmvSketch(hashCol, 8).as("sk"))
      .select($"sk.n", $"sk.kth").collect().head
    val rerolled = toks.groupBy($"source")
      .agg(SketchAggregates.kmvHashes(hashCol, 64).as("hs"))
      .agg(SketchAggregates.kmvUnion($"hs", 8).as("sk"))
      .select($"sk.n", $"sk.kth").collect().head
    assert(rerolled == direct)
  }

  test("kmv_union is partition-invariant and ignores empty groups") {
    val toks = docs.select($"doc_id" % 13 as "g",
      explode(TextFunctions.tokens($"text")).as("t"))
    val hs = toks.groupBy($"g").agg(SketchAggregates.kmvHashes(hashCol, 16).as("hs"))
    val a = hs.agg(SketchAggregates.kmvUnion($"hs", 16)).collect().head
    val b = hs.repartition(11).agg(SketchAggregates.kmvUnion($"hs", 16)).collect().head
    assert(a == b)
    // an all-empty input yields the (0, 0) empty sketch
    val empty = Seq.empty[String].toDF("t")
      .agg(SketchAggregates.kmvHashes(TextHashExpressions.fnv64($"t"), 16).as("hs"))
      .agg(SketchAggregates.kmvUnion($"hs", 16).as("sk"))
      .select($"sk.n", $"sk.kth").collect().head
    assert(empty.getInt(0) == 0 && empty.getLong(1) == 0L)
  }
}
