package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the Hilbert curve index (xy2d).
  *
  * The portable form ([[graft.operators.InfraOps.hilbertCol]]) runs the
  * rotate-and-accumulate walk as a higher-order `aggregate` fold —
  * correct and engine-portable, but higher-order functions are
  * interpreted: ~20 expression-node evaluations per bit level per row.
  * This expression compiles the whole walk into one tight primitive loop
  * inside whole-stage codegen (same preference-order-(b) argument as
  * [[VectorExpressions.DotProductF]]). Identical integer semantics — the
  * spec proves bit-equality against the fold over the full 2^(2·bits)
  * grid.
  *
  * The rotation uses the classic n−1 reflection (Wikipedia xy2d); inputs
  * outside [0, 2^bits) are reduced mod 2^bits so the expression is total.
  */
case class HilbertIndexF(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_f requires (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  private val n: Long = 1L << bits

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    var x = a.asInstanceOf[Long] & (n - 1)
    var y = b.asInstanceOf[Long] & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val dd = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & ${n - 1}L;
         |long $y = $b & ${n - 1}L;
         |long $dd = 0L;
         |for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $dd += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${n - 1}L - $x; $y = ${n - 1}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $dd;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndexF =
    copy(left = l, right = r)
}

object LayoutExpressions {
  /** Register `hilbert_f(x, y)` at the q232 grid width. Idempotent. */
  def register(spark: SparkSession, bits: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_f", exprs => HilbertIndexF(exprs.head, exprs(1), bits), "scala_udf")

  /** Codegen'd Hilbert index over two bigint column expressions
    * (register(spark, bits) first). */
  def hilbertF(x: String, y: String): Column = expr(s"hilbert_f($x, $y)")
}
