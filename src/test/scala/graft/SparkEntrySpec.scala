package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: entry() returns rows on the smoke
  * corpus, every query has an oracle, and the two maps key-align.
  */
class SparkEntrySpec extends AnyFunSuite with SparkTest {

  test("entry() returns rows on the sf0.001 smoke corpus") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
  }
}
