package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for winnowing document fingerprints (the
  * MOSS scheme: rolling char-gram hashes, minimum per sliding window,
  * distinct minima = the document's fingerprint set).
  *
  * The composed form exploded one row per CHARACTER and ran 12 chained
  * `lead()` window passes — an ×n_chars row blowup through a shuffle, the
  * worst plan in the repo at 100 TB. This expression computes the whole
  * fingerprint set in one pass over the string inside whole-stage codegen;
  * only the ~n/w distinct fingerprints are ever exploded into rows.
  *
  * Semantics are bit-identical to the composed form (and the DuckDB
  * oracle): char values via `ascii`, gram hash = fold
  * `(acc*31 + a) mod P` over K consecutive chars, a window minimum per
  * full W-gram window, distinct minima. Preference order (b) from the
  * build rules — a custom codegen `Expression` before a custom operator.
  */
case class WinnowFingerprintsF(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_fp requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextExpressions.winnowFingerprints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExpressions.winnowFingerprints($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintsF =
    copy(child = newChild)
}

object TextExpressions {
  /** Gram length (chars). ~2 words: short grams are too dense on a small
    * vocabulary (see TextOps.q66Winnowing). */
  val K = 12
  /** Winnowing window (grams). */
  val W = 8
  private val P = Portable.P

  /** One-pass winnowing over a (pre-lowercased) string. O(n·W) with zero
    * allocations besides the output; the dedup set is bounded by the
    * fingerprint count (~n/W in expectation), not n. */
  def winnowFingerprints(s: UTF8String): ArrayData = {
    val t = s.toString
    val n = t.length
    if (n < K + W - 1) return new GenericArrayData(Array.emptyLongArray)
    val ng = n - K + 1 // gram count
    val h = new Array[Long](ng)
    var p = 0
    while (p < ng) {
      // identical fold to the composed form: acc starts at a0 un-modded,
      // then (acc*31 + a_j) mod P for j = 1..K-1
      var acc = t.charAt(p).toLong
      var j = 1
      while (j < K) { acc = (acc * 31 + t.charAt(p + j)) % P; j += 1 }
      h(p) = acc
      p += 1
    }
    val nw = ng - W + 1 // only FULL windows emit a minimum
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    while (i < nw) {
      var m = h(i)
      var j = 1
      while (j < W) { val v = h(i + j); if (v < m) m = v; j += 1 }
      if (seen.add(m)) out += m
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** Register `winnow_fp` in the session's function registry (same bridge
    * as [[VectorExpressions.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fp", exprs => WinnowFingerprintsF(exprs.head), "scala_udf")
}
