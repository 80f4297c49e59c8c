package graft.queries

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

/** Library sessions run Spark 4's DEFAULT semantics — ANSI mode ON —
  * while Verify/Bench pin the reference's lenient mode off. Every query
  * in the inventory must construct, execute, and return identical rows
  * either way: a silent ANSI-only failure (strict cast, overflow,
  * element_at on a missing key) would make the library unusable on a
  * stock cluster even with the oracle gate green.
  */
class QueryAnsiParitySpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  test("every inventory query returns identical rows under ANSI mode") {
    val ansi = spark.newSession()
    ansi.conf.set("spark.sql.ansi.enabled", "true")
    ansi.conf.set("spark.sql.shuffle.partitions", "8")
    // the events table needs the nanos bridge in ANY session that scans it
    ansi.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val mismatches = QueryPack.all.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      def rowsOf(s: org.apache.spark.sql.SparkSession): Seq[String] =
        try {
          val df = fn(s, dir)
          df.collect().map(_.toString).sorted.toSeq
        } catch { case e: Throwable => Seq(s"EXCEPTION: ${e.getClass.getName}: ${e.getMessage}") }
      val lenient = rowsOf(spark)
      val strict = rowsOf(ansi)
      if (lenient == strict) None
      else Some(s"$name: lenient=${lenient.take(2)}... strict=${strict.take(2)}...")
    }
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }
}
