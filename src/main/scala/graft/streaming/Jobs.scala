package graft.streaming

import graft.sources.EnvelopeStore
import org.apache.spark.sql.{DataFrame, SparkSession}

import StreamingJobBase.{JobOpts, TelemetryKafkaTopic}

/** Job entry points mirroring the reference's ten `main()`s: one
  * streaming/batch dual-mode runner per pipeline. Streaming mode reads
  * Kafka with the reference's consumer options
  * (ErrorAggregatorBase.scala:131-141); batch mode runs a per-day loop
  * over the partitioned envelope store with pruning
  * (ErrorAggregatorBase.scala:157-197).
  *
  * Kafka is wired but not exercisable in this environment (no broker);
  * the batch/`MemoryStream` paths run the identical aggregate code, as
  * the reference's own tests rely on.
  */
object Jobs {

  def kafkaStream(spark: SparkSession, opts: JobOpts,
                  consumerCacheCapacity: Int = 1000): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", opts.kafkaBroker.get)
      .option("failOnDataLoss", opts.flag("failOnDataLoss"))
      .option("kafka.max.partition.fetch.bytes", 8 * 1024 * 1024) // 8MB
      .option("spark.streaming.kafka.consumer.cache.maxCapacity", consumerCacheCapacity)
      .option("subscribe", TelemetryKafkaTopic)
      .option("startingOffsets", opts.startingOffsets)
      .load()
      .select("value")

  /** Shared dual-mode driver: `transform` is the pipeline's aggregate,
    * applied unchanged in both modes.
    */
  private def runDualMode(
      job: StreamingJobBase,
      opts: JobOpts,
      spark: SparkSession,
      transform: DataFrame => DataFrame,
      partitionColumns: Seq[String],
      consumerCacheCapacity: Int): Unit = {
    val outputPath = opts.getOrElse("outputPath", "/tmp/parquet")
    if (opts.isStreaming) {
      transform(kafkaStream(spark, opts, consumerCacheCapacity))
        .repartition(1)
        .writeStream
        .queryName(job.QueryName)
        .format("parquet")
        .option("path", s"$outputPath/${job.outputPrefix}")
        .option("checkpointLocation", opts.checkpointPath)
        .partitionBy(partitionColumns: _*)
        .start()
        .awaitTermination()
    } else {
      val envelopeDir = opts.get("envelopeDir")
        .getOrElse(throw new IllegalArgumentException("--envelopeDir required in batch mode"))
      job.datesBetween(opts.from.get, opts.to).foreach { date =>
        val pings = EnvelopeStore.read(spark, envelopeDir, submissionDate = Some(date))
        transform(pings)
          .repartition(opts.numParquetFiles)
          .write
          .mode("overwrite")
          .partitionBy(partitionColumns: _*)
          .parquet(s"$outputPath/${job.outputPrefix}")
      }
    }
  }

  /** Error aggregates job (reference job #1). */
  object ErrorAggregatorJob {
    def main(args: Array[String]): Unit = {
      val opts = StreamingJobBase.parseOpts("error_aggregator", args)
      val spark = ErrorAggregatorJobDef.buildSession("Error Aggregates")
      run(spark, opts)
      if (!opts.isStreaming) spark.stop()
    }
    def run(spark: SparkSession, opts: JobOpts): Unit =
      runDualMode(ErrorAggregatorJobDef, opts, spark,
        df => ErrorAggregator.aggregate(df, opts.raiseOnError),
        Seq("submission_date_s3"), consumerCacheCapacity = 1000)
  }
  private object ErrorAggregatorJobDef extends StreamingJobBase {
    override val JobName = "error_aggregator"
    override val outputPrefix = "error_aggregator/v2"
  }

  /** Event-ping explode job (reference job #6). */
  object EventPingEventsJob {
    def main(args: Array[String]): Unit = {
      val opts = StreamingJobBase.parseOpts("event_ping_events", args)
      val spark = EventPingEventsJobDef.buildSession("Event Ping Events")
      run(spark, opts)
      if (!opts.isStreaming) spark.stop()
    }
    def run(spark: SparkSession, opts: JobOpts): Unit = {
      val maxRecords = opts.getOrElse("max-records-per-file", "10000000")
      if (opts.isStreaming) {
        import org.apache.spark.sql.functions.lit
        EventPingEvents.explodeEvents(kafkaStream(spark, opts, consumerCacheCapacity = 10))
          .withColumn("submission_date_s3",
            org.apache.spark.sql.functions.date_format(
              org.apache.spark.sql.functions.from_unixtime(org.apache.spark.sql.functions.col("timestamp")), "yyyyMMdd"))
          .withColumn("doc_type", lit("event"))
          .repartition(1)
          .writeStream
          .queryName(EventPingEventsJobDef.QueryName)
          .format("parquet")
          .option("path", s"${opts.getOrElse("outputPath", "/tmp/parquet")}/${EventPingEventsJobDef.outputPrefix}")
          .option("checkpointLocation", opts.checkpointPath)
          .partitionBy("submission_date_s3", "doc_type")
          .start()
          .awaitTermination()
      } else {
        val envelopeDir = opts.get("envelopeDir")
          .getOrElse(throw new IllegalArgumentException("--envelopeDir required in batch mode"))
        EventPingEventsJobDef.datesBetween(opts.from.get, opts.to).foreach { date =>
          val pings = EnvelopeStore.read(spark, envelopeDir,
            submissionDate = Some(date), docTypes = Seq("event"), appNames = Seq("Firefox"))
          // manual partition dir in the path + maxRecordsPerFile, as the
          // reference does (EventPingEvents.scala:95-101)
          EventPingEvents.explodeEvents(pings)
            .write
            .option("maxRecordsPerFile", maxRecords)
            .mode("overwrite")
            .parquet(s"${opts.getOrElse("outputPath", "/tmp/parquet")}/${EventPingEventsJobDef.outputPrefix}/submission_date_s3=$date/doc_type=event")
        }
      }
    }
  }
  private object EventPingEventsJobDef extends StreamingJobBase {
    override val JobName = "event_ping_events"
    override val outputPrefix = "events/v1"
  }

  /** Enrollment aggregates job (reference job #7). */
  object ExperimentEnrollmentsJob {
    def main(args: Array[String]): Unit = {
      val opts = StreamingJobBase.parseOpts("experiment_enrollments_aggregator", args)
      val spark = EnrollmentsJobDef.buildSession("Experiment Enrollments Aggregates")
      run(spark, opts)
      if (!opts.isStreaming) spark.stop()
    }
    def run(spark: SparkSession, opts: JobOpts): Unit =
      runDualMode(EnrollmentsJobDef, opts, spark,
        df => ExperimentEnrollmentsAggregator.aggregate(df),
        Seq("submission_date_s3"), consumerCacheCapacity = 100)
  }
  private object EnrollmentsJobDef extends StreamingJobBase {
    override val JobName = "experiment_enrollments_aggregator"
    override val outputPrefix = "experiment_enrollments/v1"
  }
}
