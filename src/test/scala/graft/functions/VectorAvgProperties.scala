package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.VectorAvg
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** VectorAvg's aggregation contract, driven directly through
  * update/merge/serialize/eval — partition-shape invariance is the
  * property Spark's partial aggregation relies on, checked here against
  * arbitrary splits of arbitrary vector batches.
  */
object VectorAvgProperties extends Properties("VectorAvg") {

  private val dim = 4
  private def agg = VectorAvg(
    BoundReference(0, ArrayType(DoubleType), nullable = true), dim)

  private def row(v: Seq[Double]): InternalRow =
    InternalRow(new GenericArrayData(v.toArray[Any]))

  private def runPartitions(parts: Seq[Seq[Seq[Double]]]): Option[Seq[Double]] = {
    val a = agg
    val partials = parts.map { p =>
      // round-trip each partial through serialize/deserialize, as a real
      // shuffle would
      a.deserialize(a.serialize(
        p.foldLeft(a.createAggregationBuffer())((buf, v) => a.update(buf, row(v)))))
    }
    val merged = partials.foldLeft(a.createAggregationBuffer())(a.merge)
    Option(a.eval(merged)).map { r =>
      val arr = r.asInstanceOf[ArrayData]
      (0 until dim).map(arr.getDouble)
    }
  }

  private val vec: Gen[Seq[Double]] =
    Gen.listOfN(dim, Gen.chooseNum(-1000.0, 1000.0)).map(_.toSeq)
  private val batch: Gen[List[Seq[Double]]] = Gen.nonEmptyListOf(vec)

  property("merge-of-partials equals the single-pass mean, any partitioning") =
    forAll(batch, Gen.chooseNum(1, 5)) { (vs, nParts) =>
      val expected = (0 until dim).map(i => vs.map(_(i)).sum / vs.length)
      val whole = runPartitions(Seq(vs)).get
      val split = runPartitions(
        vs.zipWithIndex.groupMap(_._2 % nParts)(_._1).values.toSeq).get
      (0 until dim).forall { i =>
        math.abs(whole(i) - expected(i)) < 1e-9 &&
          math.abs(split(i) - expected(i)) < 1e-9
      }
    }

  property("empty and all-null groups evaluate to null; null rows are ignored") =
    forAll(batch) { vs =>
      val a = agg
      val empty = a.eval(a.createAggregationBuffer()) == null
      val withNulls = vs.foldLeft(a.createAggregationBuffer()) { (buf, v) =>
        a.update(a.update(buf, InternalRow(null)), row(v))
      }
      val ignoringNulls = Option(a.eval(withNulls)).exists { r =>
        val arr = r.asInstanceOf[ArrayData]
        (0 until dim).forall(i =>
          math.abs(arr.getDouble(i) - vs.map(_(i)).sum / vs.length) < 1e-9)
      }
      empty && ignoringNulls
    }

  property("a poisoned partial poisons every merge containing it") =
    forAll(batch) { vs =>
      val a = agg
      val bad = a.update(a.createAggregationBuffer(),
        row(Seq(1.0))) // wrong length ⇒ poison
      val good = vs.foldLeft(a.createAggregationBuffer())((b, v) => a.update(b, row(v)))
      a.eval(a.merge(good, bad)) == null && a.eval(a.merge(bad, good)) == null
    }
}
