package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The higher-order-function form ([[Portable.dot]]) allocates a zipped
  * array and interprets ~4 expression nodes per element; this expression
  * compiles to a tight primitive loop inside whole-stage codegen — no
  * allocations, no virtual calls. Semantics are identical: each float is
  * widened to double and terms are accumulated strictly left-to-right, so
  * results stay bit-identical to the portable form (and to the DuckDB
  * oracle).
  *
  * This is preference order (b) from the build rules: a custom
  * `Expression` where builtins are too slow, before reaching for a custom
  * operator or mapPartitions.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_f requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  // NULL semantics match the HOF form (`aggregate(zip_with(...))`) so the
  // RewriteDotProduct optimizer rule is semantics-preserving: ragged
  // lengths or a null element make zip_with's lambda yield null and the
  // whole aggregate null — so here too.
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i)); }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF =
    copy(left = l, right = r)
}

/** Shared shape for the generalized pairwise-fold expressions: walk two
  * arrays (each independently `array<float>` or `array<double>`), widen
  * every element to double, accumulate a per-index term strictly
  * left-to-right. Same null semantics as [[DotProductF]] / the HOF forms
  * (ragged lengths or a null element → null). Bit-identical to the
  * interpreted `aggregate(zip_with(...))` pipelines they replace — the
  * mixed float/double case is what [[RewriteDotProduct]]'s conservative
  * float-only pattern can't catch, and it dominates the k-means tier
  * (vectors are float, trained centroids are double). */
abstract class FoldArraysAny extends BinaryExpression {
  /** Java source for the per-index term given widened double operands. */
  protected def termCode(x: String, y: String): String
  protected def termEval(x: Double, y: Double): Double

  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) == FloatType || elemType(e) == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"${prettyName} requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def get(arr: ArrayData, i: Int, e: Expression): Double =
    if (elemType(e) == FloatType) arr.getFloat(i).toDouble else arr.getDouble(i)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += termEval(get(x, i, left), get(y, i, right))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def getter(arr: String, idx: String, e: Expression) =
        if (elemType(e) == FloatType) s"((double) $arr.getFloat($idx))"
        else s"$arr.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $acc += ${termCode(getter(a, i, left), getter(b, i, right))}; }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Codegen'd dot product over any float/double array combination. */
case class DotA(left: Expression, right: Expression) extends FoldArraysAny {
  override protected def termCode(x: String, y: String): String = s"$x * $y"
  override protected def termEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotA =
    copy(left = l, right = r)
}

/** Codegen'd squared-L2 distance over any float/double array combination
  * — the [[graft.ml.KMeansIvf.distSq]] fold as a primitive loop. */
case class DistSqA(left: Expression, right: Expression) extends FoldArraysAny {
  override protected def termCode(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def termEval(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DistSqA =
    copy(left = l, right = r)
}

object VectorExpressions {
  import org.apache.spark.sql.functions.{expr => sqlExpr, round, sqrt}

  /** Register `dot_f` in the session's function registry (Spark 4's
    * Column API no longer exposes raw expressions, so SQL-name
    * registration is the supported bridge for custom expressions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProductF(exprs.head, exprs(1)), "scala_udf")

  /** Register the generalized fold expressions (`dot_a`, `dist_sq_a`).
    * Idempotent; also injected library-wide by GraftExtensions. */
  def registerAny(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_a", exprs => DotA(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dist_sq_a", exprs => DistSqA(exprs.head, exprs(1)), "scala_udf")
  }

  /** Codegen'd dot product over two `array<float>` column expressions
    * (register(spark) first). */
  def dotF(a: String, b: String): Column = sqlExpr(s"dot_f($a, $b)")

  /** Codegen'd cosine similarity, rounded to 6 dp — drop-in replacement
    * for [[Portable.cosine]] with identical results. */
  def cosineF(a: String, b: String): Column =
    round(dotF(a, b) / (sqrt(dotF(a, a)) * sqrt(dotF(b, b))), 6)

  /** Codegen'd cosine over any float/double array combination
    * (registerAny(spark) first) — identical results to
    * [[graft.functions.Portable.cosine]]. */
  def cosineA(a: String, b: String): Column =
    round(sqlExpr(s"dot_a($a, $b)") /
      (sqrt(sqlExpr(s"dot_a($a, $a)")) * sqrt(sqlExpr(s"dot_a($b, $b)"))), 6)
}
