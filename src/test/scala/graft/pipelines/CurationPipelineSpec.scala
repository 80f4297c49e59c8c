package graft.pipelines

import java.nio.file.Files

import graft.SparkTest
import graft.functions.TextFunctions
import graft.monitoring.ObservedMetrics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationPipelineSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming ingest twin: dedup within watermark, quality floor, split") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Long) = new Timestamp(m * 60000L)
    val good = ("quality " * 60).trim // long, no punct, needs stopwords
    val goodText = s"the and of is to on $good"
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val curated = CurationPipeline.curateStream(
      input.toDF().toDF("doc_id", "text", "lang", "ts"), "ts", "10 minutes")
    val q = curated.writeStream.format("memory")
      .queryName("curate_stream").outputMode("append").start()
    try {
      input.addData(
        (1L, goodText, "en", ts(0)),
        (2L, goodText + "!!", "en", ts(1)), // same normalized text → dup collapses
        (3L, "!!!???!!!", "en", ts(2)))     // all punctuation → fails the floor
      q.processAllAvailable()
      input.addData((99L, goodText + " fresh tail words", "en", ts(60)))
      q.processAllAvailable()
      val rows = spark.table("curate_stream")
        .select($"doc_id", $"split").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      val ids = rows.map(_._1).toSet
      assert(!ids.contains(3L), s"low-quality doc survived: $ids")
      assert(ids.intersect(Set(1L, 2L)).size == 1,
        s"normalized duplicate must collapse to one survivor: $ids")
      assert(ids.contains(99L), s"fresh doc must land: $ids")
      assert(rows.forall(r => Set("train", "valid", "test").contains(r._2)))
    } finally q.stop()
  }

  test("curation pipeline composes the operators, reports stage metrics, writes the layout") {
    val docs = graft.Tables.documents(spark, sfDir)
    val eval = docs.filter($"doc_id" % 100 === 0).select($"text")
    val train = docs.filter($"doc_id" % 100 =!= 0)
    val collector = new ObservedMetrics.Collector
    spark.listenerManager.register(collector)
    val out = Files.createTempDirectory("curated").toString
    try {
      val curated = CurationPipeline.curate(train, eval)
      CurationPipeline.write(curated, out)

      // partitioned layout: lang=<v>/split=<v> directories
      val written = spark.read.parquet(out)
      val langDirs = new java.io.File(out).listFiles.filter(_.isDirectory).map(_.getName)
      assert(langDirs.nonEmpty && langDirs.forall(_.startsWith("lang=")))
      val splits = written.select($"split").distinct().as[String].collect().toSet
      assert(splits.contains("train") && splits.subsetOf(Set("train", "valid", "test")))

      // the funnel only shrinks, and the observed metrics saw each stage
      var deadline = System.nanoTime() + 10_000_000_000L
      def stage(n: String): Long = {
        var r = collector.get(n)
        while (r.isEmpty && System.nanoTime() < deadline) {
          Thread.sleep(50); r = collector.get(n)
        }
        assert(r.isDefined, s"stage $n metrics never arrived")
        r.get.getAs[Long]("rows")
      }
      val (ex, nd, q, dc) = (stage("curation_exact_dedup"), stage("curation_near_dedup"),
        stage("curation_quality"), stage("curation_decontam"))
      assert(ex >= nd && nd >= q && q >= dc && dc > 0, s"funnel $ex >= $nd >= $q >= $dc")
      assert(written.count() == dc)

      // survivors honor the quality floor; no survivor shares >= 3
      // distinct 3-grams with the eval corpus
      assert(written.filter(TextFunctions.qualityScore($"text") < 0.3).count() == 0)
      val evalSh = eval.select(explode(array_distinct(
        TextFunctions.shingles($"text", 3))).as("shingle")).distinct()
      val contaminated = written.select($"doc_id", explode(array_distinct(
          TextFunctions.shingles($"text", 3))).as("shingle"))
        .join(evalSh, Seq("shingle"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
        .filter($"n" >= 3)
      assert(contaminated.isEmpty)

      // determinism: a second run produces the identical doc set + splits
      val again = CurationPipeline.curate(train, eval)
        .select($"doc_id", $"split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val first = written.select($"doc_id", $"split")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(again == first)
    } finally {
      spark.listenerManager.unregister(collector)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
