package graft.learning

/** Sign-based resilient-propagation (RProp) step with the frecency
  * model's constraints (reference:
  * src/main/scala/com/mozilla/telemetry/learning/federated/FederatedLearningRPropOptimizer.scala:6-66).
  *
  * Per-coordinate: if the gradient kept its sign vs the previous step the
  * learning rate grows (×α capped at max); a sign flip shrinks it (×β
  * floored at min); the update is `rate · signum(gradient)`. Constraints:
  * shift all weights non-negative, then force the first four time-bucket
  * weights strictly monotone (+1 spacing).
  */
object RPropOptimizer {

  val Alpha = 2.0
  val Beta = 0.6
  val MinValue = 1.0
  val MaxValue = 3.0

  final case class StepResult(weights: Array[Double], learningRates: Array[Double])

  def fit(weights: Array[Double],
          gradient: Array[Double],
          previousGradient: Option[Array[Double]],
          learningRates: Array[Double],
          alignTimeBuckets: Boolean = true): StepResult = {
    val newRates = previousGradient match {
      case Some(prev) =>
        gradient.indices.map { i =>
          val product = gradient(i) * prev(i)
          if (product > 0) math.min(learningRates(i) * Alpha, MaxValue)
          else if (product < 0) math.max(learningRates(i) * Beta, MinValue)
          else learningRates(i)
        }.toArray
      case None => learningRates
    }
    val updated = weights.indices.map(i => weights(i) + newRates(i) * math.signum(gradient(i))).toArray
    StepResult(applyConstraints(updated, alignTimeBuckets), newRates)
  }

  private def applyConstraints(weights: Array[Double], alignTimeBuckets: Boolean): Array[Double] = {
    val min = weights.min
    val nonNegative = if (min < 0) weights.map(_ - min) else weights.clone()
    if (alignTimeBuckets) {
      // Time-bucket cut points must stay strictly increasing.
      nonNegative(1) = math.max(nonNegative(1), nonNegative(0) + 1)
      nonNegative(2) = math.max(nonNegative(2), nonNegative(1) + 1)
      nonNegative(3) = math.max(nonNegative(3), nonNegative(2) + 1)
    }
    nonNegative
  }
}
