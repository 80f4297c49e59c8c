package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Group-aware split gate ([[Splits.groupAwareSplit]], q144's operator):
  * hand graphs pin the representative's-bucket rule exactly; the
  * leakage-zero and ingest-stability properties are asserted as
  * invariants on a pseudo-random corpus.
  */
class GroupSplitSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def split(rows: Seq[(Long, Long)], pairs: Seq[(Long, Long)],
                    trainPct: Int = 80, validPct: Int = 10) = {
    val docs = rows.toDF("doc_id", "bucket")
    val p = pairs.toDF("id_a", "id_b")
    Splits.groupAwareSplit(docs, p, "doc_id", "bucket",
        trainPct = trainPct, validPct = validPct)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
  }

  test("every member inherits the min-id representative's bucket") {
    // cluster {1,2,3}: rep 1, bucket 85 -> valid for ALL members even
    // though their own buckets say train (5) and test (95);
    // cluster {10,11}: rep 10, bucket 79 -> train; singleton 20: own
    // bucket 95 -> test
    val out = split(
      rows = Seq(1L -> 85L, 2L -> 5L, 3L -> 95L, 10L -> 79L, 11L -> 92L,
        20L -> 95L),
      pairs = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L))
    assert(out.toSeq == Seq(
      (1L, 1L, "valid"), (2L, 1L, "valid"), (3L, 1L, "valid"),
      (10L, 10L, "train"), (11L, 10L, "train"), (20L, 20L, "test")))
  }

  test("no cluster straddles splits; singletons match the per-doc rule") {
    val rng = new scala.util.Random(41)
    val docs = (0L until 400L).map(i => (i, rng.nextInt(100).toLong))
    // chain every 4th pair of consecutive ids into 2-doc clusters
    val pairs = (0L until 400L by 8L).map(i => (i, i + 1))
    val docsDf = docs.toDF("doc_id", "bucket")
    val out = Splits.groupAwareSplit(docsDf, pairs.toDF("id_a", "id_b"),
      "doc_id", "bucket")
    val straddlers = out.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddlers == 0L)
    // singletons (ids not in any pair) split exactly as q46 would
    val paired = pairs.flatMap { case (a, b) => Seq(a, b) }.toSet
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    docs.filterNot { case (id, _) => paired(id) }.foreach { case (id, b) =>
      val expected = if (b < 80) "train" else if (b < 90) "valid" else "test"
      assert(byId(id) == expected, s"singleton $id bucket $b")
    }
    // proportions at CLUSTER granularity stay near 80/10/10
    val train = out.filter(col("split") === "train").count()
    assert(train > 250 && train < 380, s"train count $train")
  }

  test("ingesting a near-dup never moves an existing doc's split") {
    val before = split(
      rows = Seq(1L -> 85L, 2L -> 5L, 7L -> 95L),
      pairs = Seq(1L -> 2L))
    // doc 9 arrives as a near-dup of 2 AND of 7: the merged cluster's
    // rep is STILL 1 (min id), so 1/2 stay valid; 7 joins them
    val after = split(
      rows = Seq(1L -> 85L, 2L -> 5L, 7L -> 95L, 9L -> 33L),
      pairs = Seq(1L -> 2L, 9L -> 2L, 9L -> 7L))
    val beforeById = before.map(t => t._1 -> t._3).toMap
    val afterById = after.map(t => t._1 -> t._3).toMap
    assert(afterById(1L) == beforeById(1L) && afterById(2L) == beforeById(2L))
    assert(after.forall(_._3 == "valid")) // one merged cluster, rep 1
    assert(after.forall(_._2 == 1L))
  }

  test("invalid cuts are rejected") {
    val docs = Seq((1L, 5L)).toDF("doc_id", "bucket")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Splits.groupAwareSplit(docs, pairs, "doc_id", "bucket",
        trainPct = 95, validPct = 10)
    }
  }
}
