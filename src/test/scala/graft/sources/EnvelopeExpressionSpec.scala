package graft.sources

import graft.SparkTest
import graft.pings.TestMessages
import org.apache.spark.sql.graft.EnvelopeExpressions
import org.scalatest.funsuite.AnyFunSuite

class EnvelopeExpressionSpec extends AnyFunSuite with SparkTest {

  private def envelopesDF = {
    import spark.implicits._
    spark.createDataset(
      (TestMessages.crashMessages(4) ++ TestMessages.mainMessages(2) ++
        TestMessages.coreMessages(1)).map(_.toBytes)).toDF("value")
  }

  test("envelope_field extracts scalar fields via the Column API") {
    val df = envelopesDF
    val counts = df
      .groupBy(EnvelopeExpressions.envelopeField(df("value"), "docType").as("doc_type"))
      .count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("crash" -> 4L, "main" -> 2L, "core" -> 1L))
  }

  test("early allow-list filter before the typed parse") {
    val df = envelopesDF
    val onlyCrashes = df.filter(
      EnvelopeExpressions.envelopeField(df("value"), "docType") === "crash")
    assert(onlyCrashes.count() == 4)
    // the filtered frame feeds the same aggregate unchanged
    val agg = graft.streaming.ErrorAggregator.aggregate(onlyCrashes, raiseOnError = true)
    assert(agg.collect().map(_.getAs[Long]("count")).sum == 12L) // 4 crashes x 3 experiment rows
  }

  test("envelope_field registered as a SQL function") {
    EnvelopeExpressions.register(spark)
    envelopesDF.createOrReplaceTempView("envelopes")
    val rows = spark.sql(
      """SELECT envelope_field(value, 'appName') AS app, COUNT(*) AS n
        |FROM envelopes GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toSeq ==
      Seq("Fennec" -> 1L, "Firefox" -> 6L))
  }

  test("undecodable bytes evaluate to null, not an error") {
    import spark.implicits._
    val junk = spark.createDataset(Seq(Array[Byte](1, 2, 3))).toDF("value")
    val out = junk.select(EnvelopeExpressions.envelopeField(junk("value"), "docType")).collect()
    assert(out.head.isNullAt(0))
  }
}
