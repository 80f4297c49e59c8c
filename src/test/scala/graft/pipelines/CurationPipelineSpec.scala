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
