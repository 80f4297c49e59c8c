package graft.learning

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks of the RProp step (the reference verifies the same
  * algorithm against a recorded 30-iteration corpus —
  * reference: src/test/scala/com/mozilla/telemetry/learning/federated/FederatedLearningRPropOptimizerTest.scala:14-56).
  */
class RPropOptimizerSpec extends AnyFunSuite {
  import RPropOptimizer._

  private val n = 22
  private def weights = Array.tabulate(n)(i => 10.0 * (i + 1))
  private def rates = Array.fill(n)(2.0)

  test("first step moves each weight by rate * signum(gradient)") {
    val gradient = Array.tabulate(n)(i => if (i % 2 == 0) 5.0 else -3.0)
    val r = fit(weights, gradient, None, rates, alignTimeBuckets = false)
    r.weights.zip(weights).zipWithIndex.foreach { case ((nw, w), i) =>
      val expected = w + 2.0 * math.signum(gradient(i))
      assert(nw == expected, s"index $i")
    }
    assert(r.learningRates.toSeq == rates.toSeq) // no previous gradient → unchanged
  }

  test("consistent gradient sign grows the learning rate (capped)") {
    val gradient = Array.fill(n)(1.0)
    val r = fit(weights, gradient, Some(Array.fill(n)(2.0)), rates, alignTimeBuckets = false)
    // 2.0 * alpha = 4.0 capped at MaxValue = 3.0
    assert(r.learningRates.forall(_ == MaxValue))
  }

  test("sign flip shrinks the learning rate (floored)") {
    val gradient = Array.fill(n)(1.0)
    val r = fit(weights, gradient, Some(Array.fill(n)(-1.0)), rates, alignTimeBuckets = false)
    // 2.0 * beta = 1.2; floor max(1.2, MinValue=1.0) = 1.2
    assert(r.learningRates.forall(_ == 1.2))
    val r2 = fit(weights, gradient, Some(Array.fill(n)(-1.0)), Array.fill(n)(1.1), alignTimeBuckets = false)
    assert(r2.learningRates.forall(_ == MinValue)) // 0.66 floored at 1.0
  }

  test("zero gradient product keeps the rate") {
    val gradient = Array.fill(n)(0.0)
    val r = fit(weights, gradient, Some(Array.fill(n)(1.0)), rates, alignTimeBuckets = false)
    assert(r.learningRates.toSeq == rates.toSeq)
    assert(r.weights.toSeq == weights.toSeq) // signum(0) = 0 → no movement
  }

  test("negative weights shift to non-negative") {
    val w = Array.fill(n)(0.0)
    val gradient = Array.fill(n)(-1.0)
    val r = fit(w, gradient, None, rates, alignTimeBuckets = false)
    // all weights move to -2, then shift by +2 → all 0
    assert(r.weights.forall(_ == 0.0))
  }

  test("time buckets forced strictly increasing") {
    val w = Array.fill(n)(5.0)
    val gradient = Array.fill(n)(0.0)
    val r = fit(w, gradient, None, rates)
    assert(r.weights(0) == 5.0)
    assert(r.weights(1) == 6.0)
    assert(r.weights(2) == 7.0)
    assert(r.weights(3) == 8.0)
    assert(r.weights(4) == 5.0)
  }
}
