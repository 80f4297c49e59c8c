package graft.learning

import org.scalacheck.{Gen, Prop, Properties}

/** Invariants of the RProp step under arbitrary gradients/rates. */
object RPropProperties extends Properties("graft.rprop") {

  private val n = 22
  private val genVec: Gen[Array[Double]] =
    Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3)).map(_.toArray)
  private val genRates: Gen[Array[Double]] =
    Gen.listOfN(n, Gen.chooseNum(RPropOptimizer.MinValue, RPropOptimizer.MaxValue)).map(_.toArray)

  property("weights are non-negative after constraints") =
    Prop.forAll(genVec, genVec, genRates) { (w, g, lr) =>
      RPropOptimizer.fit(w, g, None, lr).weights.forall(_ >= 0.0)
    }

  property("time buckets strictly increase when aligned") =
    Prop.forAll(genVec, genVec, genRates) { (w, g, lr) =>
      val out = RPropOptimizer.fit(w, g, None, lr, alignTimeBuckets = true).weights
      out(1) > out(0) && out(2) > out(1) && out(3) > out(2)
    }

  property("learning rates stay within [min, max] given a previous gradient") =
    Prop.forAll(genVec, genVec, genVec, genRates) { (w, g, prev, lr) =>
      RPropOptimizer.fit(w, g, Some(prev), lr).learningRates
        .forall(r => r >= RPropOptimizer.MinValue * RPropOptimizer.Beta - 1e-9 &&
                     r <= RPropOptimizer.MaxValue + 1e-9)
    }

  property("per-coordinate movement bounded by the learning rate") =
    Prop.forAll(genVec, genVec, genRates) { (w, g, lr) =>
      val out = RPropOptimizer.fit(w, g, None, lr, alignTimeBuckets = false).weights
      val shifted = w.indices.map(i => w(i) + lr(i) * math.signum(g(i)))
      val minShift = shifted.min
      val offset = if (minShift < 0) -minShift else 0.0
      out.indices.forall(i => math.abs(out(i) - (shifted(i) + offset)) < 1e-9)
    }
}
