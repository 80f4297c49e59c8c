package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cdc's contract: SCD2 intervals are half-open and adjacent (each
  * valid_to equals the key's next valid_from; exactly one open row per
  * key), and applyChanges implements MERGE latest-wins — the newest row
  * decides, deletes tombstone, later upserts resurrect, and same-version
  * collisions resolve deterministically by the tie-break.
  */
class CdcSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // (key, version, tie, value, op)
  private val log = Seq(
    ("a", 1L, 1L, 10, "U"),
    ("a", 3L, 2L, 30, "U"),
    ("a", 2L, 3L, 20, "U"),
    ("b", 1L, 4L, 11, "U"),
    ("b", 5L, 5L, 0, "D"), // newest is a delete → b absent from snapshot
    ("c", 2L, 6L, 0, "D"),
    ("c", 4L, 7L, 42, "U"), // delete then upsert → c resurrected
    ("d", 7L, 8L, 1, "U"),
    ("d", 7L, 9L, 2, "U") // same version: tie-break (9 > 8) wins
  ).toDF("k", "v", "tk", "value", "op")

  test("scd2: adjacent half-open intervals, one open row per key") {
    val h = Cdc.scd2(log, Seq("k"), col("v"), col("tk"))
      .select("k", "v", "tk", "valid_from", "valid_to", "is_current")
      .collect()
    assert(h.count(_.getAs[Boolean]("is_current")) == 4) // one per key
    // per key: sorted by (v, tk), each valid_to = next row's valid_from
    h.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r.getLong(1), r.getLong(2)))
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev.getAs[Long]("valid_to") == next.getAs[Long]("valid_from"))
        case _ =>
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to")))
      assert(sorted.init.forall(!_.getAs[Boolean]("is_current")))
    }
    // valid_from is the row's own version
    assert(h.forall(r => r.getAs[Long]("valid_from") == r.getAs[Long]("v")))
  }

  test("applyChanges: latest wins, tombstones delete, later upserts resurrect") {
    val snap = Cdc.applyChanges(log, Seq("k"), col("v"), col("tk"), col("op"))
      .select("k", "value").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(snap == Map("a" -> 30, "c" -> 42, "d" -> 2))
  }

  test("applyChanges equals scd2's open rows when the log has no deletes") {
    val noDel = log.filter(col("op") =!= "D")
    val viaScd2 = Cdc.scd2(noDel, Seq("k"), col("v"), col("tk"))
      .filter(col("is_current")).select("k", "value").collect().toSet
    val viaMerge = Cdc.applyChanges(noDel, Seq("k"), col("v"), col("tk"), col("op"))
      .select("k", "value").collect().toSet
    assert(viaScd2 == viaMerge)
  }

  test("both forms are invariant to input partitioning") {
    val p7 = log.repartition(7, col("tk"))
    assert(Cdc.applyChanges(p7, Seq("k"), col("v"), col("tk"), col("op"))
      .collect().toSet ==
      Cdc.applyChanges(log.coalesce(1), Seq("k"), col("v"), col("tk"), col("op"))
        .collect().toSet)
    assert(Cdc.scd2(p7, Seq("k"), col("v"), col("tk")).collect().toSet ==
      Cdc.scd2(log.coalesce(1), Seq("k"), col("v"), col("tk")).collect().toSet)
  }

  test("one shuffle on the key: snapshot plan has a single exchange") {
    val plan = Cdc.applyChanges(log, Seq("k"), col("v"), col("tk"), col("op"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2) // input materialize + key shuffle
  }
}
