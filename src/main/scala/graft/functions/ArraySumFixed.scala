package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise fixed-point sum of an array column: each element is
  * converted to 6-dp fixed point (`floor(x·10⁶ + 0.5)` — the [[graft
  * .operators.Det]] contract) and summed into a per-dimension long
  * accumulator.
  *
  * This is the vector twin of `Det.dsum`: the declarative alternative is
  * posexplode → groupBy(dim) → sum, which multiplies the shuffled row
  * count by the vector dimension (64× for the embeddings table). Here
  * the state per group is ONE d-length long array, partial buffers merge
  * map-side by elementwise addition (exact, associative — floats are
  * quantized BEFORE summation, so partial aggregation cannot reorder
  * float adds), and the shuffle carries d longs per group instead of d
  * rows per input row. Accepts array<float> or array<double>. Returns
  * the micro-unit sums as array<bigint>; divide by 10⁶ downstream.
  *
  * Range contract: |element| < 9.2e12 and Σ|fixed| per dimension must fit
  * a long — holds for unit-scale embeddings at any corpus size that fits
  * a cluster (2⁶³/10⁶ ≈ 9.2e12 row-sum headroom).
  */
case class ArraySumFixed(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"array_sum_fixed expects array<float|double>, got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def fixed6(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.length == 0) new Array[Long](n) else buf
    require(b.length == n, s"ragged arrays: ${b.length} vs $n")
    var i = 0
    while (i < n) {
      val d = elemType match {
        case FloatType => arr.getFloat(i).toDouble
        case _ => arr.getDouble(i)
      }
      b(i) += fixed6(d)
      i += 1
    }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other
    require(buf.length == other.length, "ragged partial buffers")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ArraySumFixed =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ArraySumFixed =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArraySumFixed =
    copy(child = newChildren(0))
  override def prettyName: String = "array_sum_fixed"
}

object ArraySumFixed {
  /** Register `array_sum_fixed(arr)` for `expr(...)` call sites. */
  def register(s: org.apache.spark.sql.SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_sum_fixed", exprs => ArraySumFixed(exprs.head), "scala_udf")
}
