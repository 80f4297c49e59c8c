package graft.learning

import graft.json._
import graft.streaming.FrecencyUpdateAggregate
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Dataset

import java.nio.charset.StandardCharsets

/** Stateful federated-learning sink, re-expressed as `foreachBatch`
  * (the reference's V1 `StreamSinkProvider` is gone in Spark 4 —
  * SURVEY.md §7.1 delta 4; semantics from
  * src/main/scala/com/mozilla/telemetry/learning/federated/FederatedLearningSearchOptimizerS3Sink.scala:30-145).
  *
  * Per micro-batch: collect the (tiny — one row per window×modelVersion)
  * aggregates to the driver, pick the minimum modelVersion ≥ the current
  * iteration, run one RProp step, write the rounded model
  * (`latest.json` + `<iteration>.json`) and the optimizer state
  * (`STATE-<n>`) through the Hadoop FS API (works against any
  * supported filesystem). Recovery order: bootstrap file > latest STATE
  * file > Firefox default weights.
  *
  * The driver-side collect is safe *only* because the upstream aggregate
  * has already reduced to per-window model rows — the 100-TB path never
  * collects raw data.
  */
class FederatedLearningSink(
    modelOutputPath: String,
    stateCheckpointPath: String,
    stateBootstrapFilePath: Option[String] = None,
    hadoopConf: Configuration = new Configuration()) extends Serializable {

  import FederatedLearningSink._

  private var _state: OptimizerState = initState()
  def state: OptimizerState = _state

  /** foreachBatch hook: `ds.writeStream.foreachBatch(sink.addBatch _)`. */
  def addBatch(data: Dataset[FrecencyUpdateAggregate], batchId: Long): Unit = {
    val aggregates = data.collect()
    val iteration = state.iteration
    val eligible = aggregates.filter(_.modelVersion >= iteration)
    if (eligible.nonEmpty) {
      val aggregate = eligible.minBy(_.modelVersion)
      val gradient = aggregate.avgUpdates
      val step = RPropOptimizer.fit(state.weights, gradient, state.gradient, state.learningRates)
      val newIteration = iteration + 1
      val newState = OptimizerState(newIteration, step.weights, step.learningRates, Some(gradient))
      writeModel(ModelOutput(step.weights.map(w => math.round(w).toInt), newIteration))
      writeState(newState)
      _state = newState
    }
  }

  private[learning] def writeModel(model: ModelOutput): Unit = {
    val json = model.toJson
    writeFile(new Path(modelOutputPath, "latest.json"), json)
    writeFile(new Path(modelOutputPath, s"${model.iteration}.json"), json)
  }

  private[learning] def writeState(s: OptimizerState): Unit =
    writeFile(new Path(stateCheckpointPath, s"STATE-${s.iteration}"), s.toJson)

  private def writeFile(path: Path, content: String): Unit = {
    val fs = path.getFileSystem(hadoopConf)
    val out = fs.create(path, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readFile(path: Path): String = {
    val fs = path.getFileSystem(hadoopConf)
    val in = fs.open(path)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** bootstrap file > latest STATE-n > hardcoded defaults
    * (reference: FederatedLearningSearchOptimizerS3Sink.scala:104-145).
    */
  private[learning] def initState(): OptimizerState = {
    val checkpoint = new Path(stateCheckpointPath)
    val fs = checkpoint.getFileSystem(hadoopConf)
    if (!fs.exists(checkpoint)) fs.mkdirs(checkpoint)

    stateBootstrapFilePath match {
      case Some(bootstrap) => OptimizerState.fromJson(readFile(new Path(bootstrap)))
      case None =>
        val stateFiles = fs.listStatus(checkpoint).map(_.getPath.getName)
          .filter(_.startsWith("STATE-"))
        if (stateFiles.nonEmpty) {
          val latest = stateFiles.maxBy(_.stripPrefix("STATE-").toLong)
          OptimizerState.fromJson(readFile(new Path(checkpoint, latest)))
        } else {
          OptimizerState(0, StartingWeights.map(_.toDouble),
            Array.fill(NumberOfFeatures)(StartingLearningRate.toDouble), None)
        }
    }
  }
}

object FederatedLearningSink {

  /** Firefox's shipped frecency weights — the public bootstrap constants
    * (reference: FederatedLearningSearchOptimizerS3Sink.scala:23-28, which
    * cites browser/app/profile/firefox.js).
    */
  val StartingWeights: Array[Int] =
    Array(4, 14, 31, 90, 100, 70, 50, 30, 10, 0, 0, 100, 2000, 75, 0, 0, 0, 25, 0, 140, 200, 0)
  val NumberOfFeatures: Int = StartingWeights.length
  val StartingLearningRate: Int = 2

  final case class ModelOutput(model: Array[Int], iteration: Long) {
    def toJson: String = JsonObject.of(
      ("model", JsonArray(model.toVector.map(Json.num(_)))),
      ("iteration", Json.num(iteration))).render
  }

  final case class OptimizerState(
      iteration: Long,
      weights: Array[Double],
      learningRates: Array[Double],
      gradient: Option[Array[Double]]) {
    def toJson: String = JsonObject.of(
      ("iteration", Json.num(iteration)),
      ("weights", JsonArray(weights.toVector.map(Json.num))),
      ("learningRates", JsonArray(learningRates.toVector.map(Json.num))),
      ("gradient", gradient.map(g => JsonArray(g.toVector.map(Json.num)): JsonValue)
        .getOrElse(JsonNull))).render
  }

  object OptimizerState {
    def fromJson(text: String): OptimizerState = {
      val j = Json.parse(text)
      def doubles(v: JsonValue): Array[Double] =
        v.asArray.getOrElse(Vector.empty).flatMap(_.asDouble).toArray
      OptimizerState(
        iteration = (j \ "iteration").asLong.getOrElse(0L),
        weights = doubles(j \ "weights"),
        learningRates = doubles(j \ "learningRates"),
        gradient = if ((j \ "gradient").isDefined) Some(doubles(j \ "gradient")) else None)
    }
  }
}
