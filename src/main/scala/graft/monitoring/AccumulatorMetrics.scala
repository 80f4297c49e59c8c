package graft.monitoring

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Executor→driver metrics bridge: named LongAccumulators polled by a
  * driver-side daemon that reports overflow-safe deltas — the same
  * mechanism as the reference's AccumulatorMetricsSource without
  * reaching into Spark's package-private metrics Source (reference:
  * src/main/scala/org/apache/spark/metrics/source/custom/AccumulatorMetricsSource.scala:38-93;
  * SURVEY.md §4 suggests this public re-expression).
  */
class AccumulatorMetrics(spark: SparkSession, sourceName: String,
                         pollPeriodMillis: Long = 10000L,
                         report: (String, Long) => Unit = (n, d) =>
                           org.apache.log4j.LogManager.getLogger("AccumulatorMetrics")
                             .info(s"metric $n delta=$d")) {

  private val accumulators = new ConcurrentHashMap[String, LongAccumulator]()
  private val lastSeen = new ConcurrentHashMap[String, Long]()
  private val executor = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, s"accumulator-metrics-$sourceName"); t.setDaemon(true); t
  }

  def register(name: String): LongAccumulator = {
    val acc = spark.sparkContext.longAccumulator(s"$sourceName.$name")
    accumulators.put(name, acc)
    acc
  }

  def poll(): Map[String, Long] =
    accumulators.asScala.map { case (name, acc) =>
      val current = acc.value
      val previous = lastSeen.getOrDefault(name, 0L)
      lastSeen.put(name, current)
      // overflow-safe: a reset/restarted accumulator reports from zero
      name -> math.max(0L, current - previous)
    }.toMap

  def start(): Unit =
    executor.scheduleAtFixedRate(
      () => poll().foreach { case (n, d) => report(n, d) },
      pollPeriodMillis, pollPeriodMillis, TimeUnit.MILLISECONDS)

  def stop(): Unit = executor.shutdownNow()
}

object AccumulatorMetrics {
  /** HttpSink outcome counters wired to accumulators — the reference's
    * HttpSink.Metrics (HttpSink.scala:54-87). Returns the onOutcome hook
    * for [[graft.sinks.HttpSink.Config]].
    */
  def httpSinkHook(metrics: AccumulatorMetrics): String => Unit = {
    val outcomes = Seq("success", "error", "retry", "dropped", "payload-too-large")
      .map(o => o -> metrics.register(o)).toMap
    outcome => outcomes.get(outcome).foreach(_.add(1L))
  }
}
