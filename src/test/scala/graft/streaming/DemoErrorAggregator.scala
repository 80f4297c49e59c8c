package graft.streaming

import graft.pings.TestMessages
import org.apache.spark.sql.SparkSession

/** Manual drive of the ErrorAggregator pipeline through its public API:
  * `Test/runMain graft.streaming.DemoErrorAggregator`. Prints the plan and
  * the aggregated window rows for a generated envelope batch.
  */
object DemoErrorAggregator {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val msgs = (TestMessages.crashMessages(40) ++
      TestMessages.crashMessages(1, customMetadata = """"StartupCrash": "1"""") ++
      TestMessages.mainMessages(10)).map(_.toBytes)
    val df = ErrorAggregator.aggregate(spark.createDataset(msgs).toDF("value"), raiseOnError = true)
    df.show(10, truncate = false)
    println("DRIVE-ROWS=" + df.count())
    spark.stop()
  }
}
