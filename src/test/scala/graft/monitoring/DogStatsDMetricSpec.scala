package graft.monitoring

import org.scalatest.funsuite.AnyFunSuite

/** Datagram formatting (reference:
  * src/test/scala/com/mozilla/telemetry/monitoring/DogStatsDMetricTest.scala:9-37).
  */
class DogStatsDMetricSpec extends AnyFunSuite {

  test("counter without tags") {
    assert(DogStatsDMetric.makeCounter("page.views").format() == "page.views:1|c")
  }

  test("timer with value") {
    assert(DogStatsDMetric.makeTimer("query.time", 250).format() == "query.time:250|ms")
  }

  test("sample rate") {
    assert(DogStatsDMetric.makeCounter("x", 2).format(Some(0.5)) == "x:2|c|@0.5")
  }

  test("kv and bare tags") {
    val m = DogStatsDMetric.makeCounter("users.online",
      kvTags = Some(Map("country" -> "china")), bareTags = Some(Seq("beta")))
    assert(m.format() == "users.online:1|c|#country:china,beta")
  }

  test("reserved characters normalized in names and tags, not values") {
    val m = DogStatsDMetric.makeCounter("a:b|c@d", kvTags = Some(Map("k:1" -> "v|2")))
    assert(m.format() == "a_b_c_d:1|c|#k_1:v_2")
  }
}
