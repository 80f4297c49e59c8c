package graft.operators

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** Compaction.plan contract: files at/above target are untouched 'keep'
  * singletons; small files pack into bins whose payload is within one
  * member of the target (the FFD-style bound) via the cumulative-
  * quotient rule — hand-checked, bound-checked on a seeded random
  * manifest, and invariant to input partitioning.
  */
class CompactionSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def manifest(rows: (String, Long, Long)*) =
    rows.toDF("part_key", "file_id", "size_bytes")

  test("hand-walked plan: keeps, then size-desc cumulative bins") {
    val m = manifest(
      ("p1", 1L, 100L), ("p1", 2L, 50L), ("p1", 3L, 40L),
      ("p1", 4L, 30L), ("p1", 5L, 10L))
    val plan = Compaction.plan(m, targetBytes = 80L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // 100 >= 80 → keep; smalls desc [50,40,30,10], cum [50,90,120,130],
    // bin = (cum-size) div 80 → [0,0,1,1]
    assert(plan == Set(
      ("p1", "keep", 1L, 1L, 100L),
      ("p1", "compact", 0L, 2L, 90L),
      ("p1", "compact", 1L, 2L, 40L)))
  }

  test("every file lands in exactly one bin; bytes conserved per partition") {
    val rng = new scala.util.Random(7)
    val m = manifest((1 to 400).map(i =>
      (s"p${i % 3}", i.toLong, (rng.nextInt(90) + 10).toLong * 1024)): _*)
    val plan = Compaction.plan(m, targetBytes = 256L * 1024)
    val planned = plan.agg(org.apache.spark.sql.functions.sum("n_files"),
      org.apache.spark.sql.functions.sum("bin_bytes")).collect().head
    assert(planned.getLong(0) == 400L)
    assert(planned.getLong(1) == m.collect().map(_.getLong(2)).sum)
  }

  test("non-final compact bins are within one member of the target") {
    val rng = new scala.util.Random(11)
    val target = 200L * 1024
    val m = manifest((1 to 300).map(i =>
      (s"p${i % 2}", i.toLong, (rng.nextInt(150) + 5).toLong * 1024)): _*)
    val plan = Compaction.plan(m, target).filter(_.getString(1) == "compact")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4)))
    val maxMember = 155L * 1024
    val lastBin = plan.groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).max }
    plan.foreach { case (p, bin, bytes) =>
      assert(bytes < target + maxMember, s"$p bin $bin overshoots")
      if (bin != lastBin(p))
        assert(bytes > target - maxMember, s"$p bin $bin undershoots")
    }
  }

  test("plan is invariant to manifest partitioning") {
    val m = manifest((1 to 100).map(i =>
      (s"p${i % 4}", i.toLong, (i * 37 % 120 + 8).toLong)): _*)
    val a = Compaction.plan(m, 200L).collect().map(_.toString).sorted.toSeq
    val b = Compaction.plan(m.repartition(13), 200L).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("compactTo executes the plan: conservation, bin-count, keeps byte-identical, stats regenerated") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("compact").toString
    val src = s"$work/src"; val out = s"$work/out"
    // 12 small files + 1 big file (append) so the plan has both kinds
    spark.range(0, 6000).select(col("id"), (col("id") * 7 % 101).as("x"),
        concat(lit("row-"), col("id")).as("s"))
      .repartition(12).write.parquet(src)
    spark.range(6000, 60000).select(col("id"), (col("id") * 7 % 101).as("x"),
        concat(lit("row-"), col("id")).as("s"))
      .coalesce(1).write.mode("append").parquet(src)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    def dataFiles(dir: String) = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(p => p.getName.endsWith(".parquet") &&
        !p.getName.startsWith("_") && !p.getName.startsWith("."))
    val smallMax = dataFiles(src).map(fs.getFileStatus(_).getLen).sorted
      .dropRight(1).max
    val target = smallMax * 4 // big file kept; smalls pack ~4 per bin
    val result = Compaction.compactTo(spark, src, out, target,
      statsColumns = Seq("x"))
    val rows = result.collect()
    // output file count = plan bin count, one output file per result row
    val outFiles = dataFiles(out).map(_.getName).toSet
    assert(outFiles == rows.map(_.getString(2)).toSet)
    assert(rows.count(_.getString(0) == "keep") == 1)
    assert(rows.count(_.getString(0) == "compact") >= 2)
    // row-count and CONTENT conservation (exact multiset equality)
    val before = spark.read.parquet(src)
    val after = spark.read.parquet(out)
    assert(after.count() == 60000L)
    assert(before.exceptAll(after).count() == 0)
    assert(after.exceptAll(before).count() == 0)
    // keep files are byte-identical copies
    val keepRow = rows.find(_.getString(0) == "keep").get
    val keptSrcName = keepRow.getString(2).stripPrefix("keep-")
    def bytes(p: org.apache.hadoop.fs.Path) = {
      val in = fs.open(p)
      try { val b = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(b); b } finally in.close()
    }
    assert(java.util.Arrays.equals(
      bytes(new org.apache.hadoop.fs.Path(s"$src/$keptSrcName")),
      bytes(new org.apache.hadoop.fs.Path(s"$out/${keepRow.getString(2)}"))))
    // stats sidecar regenerated for the NEW file set and usable to plan
    val statRows = spark.read.parquet(s"$out/_graft_stats")
    assert(statRows.select("file").distinct().collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName)
      .toSet == outFiles)
    val pruned = Layout.tableStatsPrunedParquet(spark, out,
      Seq(Layout.ColRange("x", 10, 20))).filter(col("x") >= 10 && col("x") <= 20)
    assert(pruned.count() ==
      after.filter(col("x") >= 10 && col("x") <= 20).count())
  }
}
