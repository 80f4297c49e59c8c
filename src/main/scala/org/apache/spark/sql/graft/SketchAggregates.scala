/* org.apache.spark.sql placement for the private[sql] Column bridge —
 * see EnvelopeExpressions.scala. */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch over a 64-bit hash
  * column — the mergeable distinct estimator whose every intermediate
  * is an INTEGER, so unlike HLL the whole estimate replays exactly in
  * ANSI SQL: the sketch is literally "the k smallest distinct hashes in
  * unsigned order", and the estimator is (k−1)·2⁶⁴ / kth_min.
  *
  * Per-group state is a bounded sorted set (≤ k longs): partials merge
  * associatively across partitions, so a distinct-count over a billion
  * rows shuffles ≤ 8k bytes per (group × partition) where a
  * count_distinct shuffles every distinct value. Result is a struct
  * (n: the number of distinct hashes retained, exact while the group
  * has < k distinct values; kth: the largest retained hash — the k-th
  * minimum — meaningful when n == k). Null hashes are ignored; an
  * empty group yields (0, 0).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "kmv_sketch: k must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("kth", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a bigint hash column, got $other")
  }

  private def newSet(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](new java.util.Comparator[java.lang.Long] {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] = newSet()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    buf.add(h)
    if (buf.size() > k) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val row = new GenericInternalRow(2)
    row.setInt(0, buf.size())
    row.setLong(1, if (buf.isEmpty) 0L else buf.last())
    row
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = newSet()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object SketchAggregates {
  /** Column form: `kmvSketch(fnv64(col("t")), 64)` → struct(n, kth). */
  def kmvSketch(hash: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvSketch(ExpressionUtils.expression(hash), k).toAggregateExpression())
}
