package graft.sources

import graft.pings.Envelope
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Partitioned envelope store — the batch-mode replacement for the
  * reference's heka S3 store (reference:
  * src/main/scala/com/mozilla/telemetry/streaming/ErrorAggregatorBase.scala:181-197,
  * which manually prunes S3 files by partition dimension before reading).
  *
  * Layout: parquet partitioned by (submission_date_s3, doc_type,
  * app_name) with a single binary `value` column. Filters on the
  * partition columns reach Catalyst's PruneFileSourcePartitions rule, so
  * a day/doctype slice of a 100 TB store lists and reads only its own
  * directories — the pruning the reference hand-rolled is free here
  * (SURVEY.md §4).
  */
object EnvelopeStore {

  val PartitionColumns: Seq[String] = Seq("submission_date_s3", "doc_type", "app_name")

  /** Persist raw envelopes, partitioned for pruned reads. */
  def write(spark: SparkSession, envelopes: Seq[Envelope], path: String,
            mode: SaveMode = SaveMode.Append): Unit = {
    import spark.implicits._
    val rows = envelopes.map { env =>
      (env.fieldString("submissionDate").getOrElse("unknown"),
        env.fieldString("docType").getOrElse("unknown"),
        env.fieldString("appName").getOrElse("unknown"),
        env.toBytes)
    }
    spark.createDataset(rows)
      .toDF("submission_date_s3", "doc_type", "app_name", "value")
      .write.mode(mode).partitionBy(PartitionColumns: _*).parquet(path)
  }

  /** Pruned scan: every filter lands on a partition column, so only the
    * matching directories are read. Returns the 1-binary-column frame the
    * pipelines consume.
    */
  def read(spark: SparkSession, path: String,
           submissionDate: Option[String] = None,
           docTypes: Seq[String] = Seq.empty,
           appNames: Seq[String] = Seq.empty): DataFrame = {
    var df = spark.read.parquet(path)
    submissionDate.foreach(d => df = df.filter(col("submission_date_s3") === d))
    if (docTypes.nonEmpty) df = df.filter(col("doc_type").isin(docTypes.map(x => x: Any): _*))
    if (appNames.nonEmpty) df = df.filter(col("app_name").isin(appNames.map(x => x: Any): _*))
    df.select("value")
  }
}
