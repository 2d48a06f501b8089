package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-smallest aggregate over a BIGINT column: keeps the `k`
  * smallest distinct values seen, returned sorted ascending.
  *
  * This is the memory-safe form of `slice(sort_array(collect_set(x)), 1, k)`:
  * `collect_set` buffers EVERY distinct value per group (a stopword's
  * posting set is the whole corpus), while this buffer never exceeds `k`
  * longs, and partial buffers combine map-side like any agg — the state
  * the operator ships per group is O(k), independent of group size.
  *
  * A [[TypedImperativeAggregate]] (not a typed `Aggregator`) so it mixes
  * with declarative aggs (`count`, `sum`) in the same `ObjectHashAggregate`
  * and plugs into the function registry for `expr(...)` call sites.
  */
case class SmallestK(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"smallest_k(col, k): k must be a foldable integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SmallestK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SmallestK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SmallestK =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "smallest_k"
}

object AggExpressions {
  /** Register `smallest_k(col, k)` for `expr(...)` call sites. */
  def register(s: org.apache.spark.sql.SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "smallest_k", exprs => SmallestK(exprs.head, exprs(1)), "scala_udf")
}
