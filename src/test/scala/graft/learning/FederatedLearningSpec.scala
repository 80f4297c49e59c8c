package graft.learning

import graft.SparkTest
import graft.json.Json
import graft.pings.TestMessages
import graft.streaming.{FrecencyAggregator, GraftClock}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class ManualClock(var now: Long) extends GraftClock {
  def millis(): Long = now
  def advance(ms: Long): Unit = now += ms
}

class FederatedLearningSpec extends AnyFunSuite with SparkTest {

  private def toDF(messages: Seq[graft.pings.Envelope]) = {
    import spark.implicits._
    spark.createDataset(messages.map(_.toBytes)).toDF("value")
  }

  test("frecency aggregate: avg loss, element-wise avg updates, HLL client count") {
    val clock = new ManualClock(1530291900000L)
    val updates1 = (1 to 22).map(_.toDouble)
    val updates2 = (1 to 22).map(_.toDouble * 3)
    val messages =
      TestMessages.frecencyMessages(1, loss = 100.0, update = updates1) ++
        TestMessages.frecencyMessages(1, loss = 300.0, update = updates2)
    val agg = FrecencyAggregator.aggregate(toDF(messages), "model1", clock, raiseOnError = true)
    val rows = agg.collect()
    assert(rows.length == 1)
    val row = rows.head
    assert(row.modelVersion == 140L)
    assert(row.avgLoss == 200.0)
    assert(row.count == 2L)
    assert(row.avgUpdates.toSeq == (1 to 22).map(_.toDouble * 2))
    assert(row.approxClientCount == 1L) // same client id
  }

  test("frecency filters: branch prefix, not-submitting, suggestions sentinel, doctype") {
    val clock = new ManualClock(0L)
    val keep = TestMessages.frecencyMessages(1)
    val wrongBranch = TestMessages.frecencyMessages(1, studyVariation = "other-model")
    val notSubmitting = TestMessages.frecencyMessages(1, studyVariation = "model1-not-submitting")
    val sentinel = TestMessages.frecencyMessages(1, suggestionsDisplayed = -2)
    val crash = TestMessages.crashMessages(1)
    val agg = FrecencyAggregator.aggregate(
      toDF(keep ++ wrongBranch ++ notSubmitting ++ sentinel ++ crash), "model1", clock)
    assert(agg.collect().map(_.count).sum == 1L)
  }

  test("stateful sink: RProp iteration + model/state files + recovery") {
    import spark.implicits._
    val clock = new ManualClock(1530291900000L)
    val modelDir = Files.createTempDirectory("model").toString
    val stateDir = Files.createTempDirectory("state").toString

    val sink = new FederatedLearningSink(modelDir, stateDir)
    assert(sink.state.iteration == 0L)
    assert(sink.state.weights.toSeq == FederatedLearningSink.StartingWeights.map(_.toDouble).toSeq)

    val agg = FrecencyAggregator.aggregate(
      toDF(TestMessages.frecencyMessages(3, modelVersion = 0L)), "model1", clock, raiseOnError = true)
    sink.addBatch(agg, 0L)

    assert(sink.state.iteration == 1L)
    val latest = Json.parse(new String(
      Files.readAllBytes(java.nio.file.Paths.get(modelDir, "latest.json"))))
    assert((latest \ "iteration").asLong.contains(1L))
    assert((latest \ "model").asArray.get.length == 22)

    // positive gradient on every coordinate moves each weight by +rate
    // before constraints; spot-check a stable coordinate
    assert(sink.state.weights(4) == FederatedLearningSink.StartingWeights(4) + 2.0)

    // an aggregate below the current iteration is ignored
    val stale = FrecencyAggregator.aggregate(
      toDF(TestMessages.frecencyMessages(1, modelVersion = 0L)), "model1", clock, raiseOnError = true)
    sink.addBatch(stale, 1L)
    assert(sink.state.iteration == 1L)

    // recovery from the STATE file round-trips
    val recovered = new FederatedLearningSink(modelDir, stateDir)
    assert(recovered.state.iteration == 1L)
    assert(recovered.state.weights.toSeq == sink.state.weights.toSeq)
    assert(recovered.state.gradient.isDefined)

    // bootstrap file takes precedence
    val bootstrap = Files.createTempFile("bootstrap", ".json")
    Files.writeString(bootstrap, FederatedLearningSink.OptimizerState(
      7L, Array.fill(22)(1.0), Array.fill(22)(2.0), None).toJson)
    val boot = new FederatedLearningSink(modelDir, stateDir, Some(bootstrap.toString))
    assert(boot.state.iteration == 7L)
    assert(boot.state.weights.forall(_ == 1.0))
  }
}
