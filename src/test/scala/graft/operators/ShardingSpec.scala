package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rendezvous sharding's contract: assignment is a pure deterministic
  * function of (id, N); expanding N → N+1 moves ONLY keys won by the
  * new shard (minimal movement — the property modulo hashing lacks);
  * the moved fraction is ≈ 1/(N+1); and shards are balanced.
  */
class ShardingSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val ids = (0L until 10000L).toDF("id")

  private def assign(n: Int): Map[Long, Int] =
    ids.select($"id", Sharding.rendezvousShard($"id", n).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("minimal movement: N → N+1 moves only keys won by the new shard") {
    for (n <- Seq(4, 8, 16)) {
      val before = assign(n)
      val after = assign(n + 1)
      val movers = before.keys.filter(k => before(k) != after(k))
      assert(movers.forall(k => after(k) == n),
        s"N=$n: a key moved between surviving shards")
      val frac = movers.size.toDouble / before.size
      // expected 1/(N+1); allow generous sampling slack
      assert(frac > 0.5 / (n + 1) && frac < 2.0 / (n + 1),
        s"N=$n: moved fraction $frac, expected ≈ ${1.0 / (n + 1)}")
    }
  }

  test("balance: no shard deviates more than 25% from the mean at 10k keys") {
    val counts = assign(8).values.groupBy(identity).map(_._2.size)
    val mean = 10000.0 / 8
    assert(counts.size == 8)
    counts.foreach(c => assert(math.abs(c - mean) / mean < 0.25, s"count $c"))
  }

  test("assignment is partitioning-invariant and pure (same id → same shard)") {
    val a = ids.repartition(7).select($"id", Sharding.rendezvousShard($"id", 9).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == assign(9))
  }

  test("wide route is bit-identical to the literal legs on either side of the boundary") {
    val both = ids.select($"id",
        Sharding.rendezvousShard($"id", 16).as("lit16"),
        Sharding.rendezvousShardWide($"id", 16).as("wide16"))
      .filter($"lit16" =!= $"wide16")
    assert(both.count() == 0)
    // past MaxLiteralLegs the public API dispatches to the wide form
    val s512 = ids.select(Sharding.rendezvousShard($"id", 512).as("s"))
    val w512 = ids.select(Sharding.rendezvousShardWide($"id", 512).as("s"))
    assert(s512.collect().map(_.getInt(0)).toSeq ==
      w512.collect().map(_.getInt(0)).toSeq)
    // constant plan size: the wide form's plan doesn't grow with N
    val p512 = s512.queryExecution.sparkPlan.toString.length
    assert(p512 < 40000, s"wide-route plan unexpectedly large: $p512 chars")
  }

  test("map-side: the assignment plans no exchange, no join") {
    val plan = ids.select(Sharding.rendezvousShard($"id", 16).as("s"))
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan.take(500))
  }
}
