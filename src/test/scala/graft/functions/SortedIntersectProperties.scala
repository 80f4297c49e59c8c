package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.SortedIntersectCount
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** sorted_intersect_count (interpreted eval path) against the Scala
  * set-intersection reference. The codegen path is covered by
  * [[SortedIntersectSpec]] through a DataFrame.
  */
object SortedIntersectProperties extends Properties("SortedIntersectCount") {

  private def lit(xs: Seq[Long]): Literal =
    Literal.create(xs.toArray, ArrayType(LongType, containsNull = false))

  private def count(a: Seq[Long], b: Seq[Long]): Int =
    SortedIntersectCount(lit(a), lit(b)).eval(null).asInstanceOf[Int]

  private val longList: Gen[List[Long]] = Gen.listOf(Gen.chooseNum(-50L, 50L))

  property("equals set-intersection size on sorted-distinct inputs") =
    forAll(longList, longList) { (a, b) =>
      val (sa, sb) = (a.distinct.sorted, b.distinct.sorted)
      count(sa, sb) == (sa.toSet intersect sb.toSet).size
    }

  property("symmetric") =
    forAll(longList, longList) { (a, b) =>
      val (sa, sb) = (a.distinct.sorted, b.distinct.sorted)
      count(sa, sb) == count(sb, sa)
    }

  property("self-intersection is the set size; empty side is 0") =
    forAll(longList) { a =>
      val sa = a.distinct.sorted
      count(sa, sa) == sa.length && count(sa, Nil) == 0 && count(Nil, sa) == 0
    }
}
