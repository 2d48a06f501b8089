package graft

import graft.functions.{Portable, TextExpressions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd winnowing expression must reproduce the composed form it
  * replaced: gram hash = fold (acc*31 + char) mod P over K chars, minimum
  * per full W-gram window, distinct minima in first-seen order-agnostic
  * set terms. The reference model here is an independent direct port of
  * those semantics. */
class WinnowSpec extends AnyFunSuite {
  import TestSpark._

  /** Straight-line model of the old char-explode + lead() plan. */
  private def model(text: String): Set[Long] = {
    val t = text.toLowerCase
    val K = TextExpressions.K; val W = TextExpressions.W; val P = Portable.P
    val n = t.length
    if (n < K + W - 1) return Set.empty
    val grams = (0 to n - K).map { p =>
      (1 until K).foldLeft(t.charAt(p).toLong)((acc, j) => (acc * 31 + t.charAt(p + j)) % P)
    }
    (0 to grams.length - W).map(i => grams.slice(i, i + W).min).toSet
  }

  test("winnow_fp matches the composed-plan model on assorted strings") {
    import spark.implicits._
    TextExpressions.register(spark)
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",                             // shorter than one gram
      "exactly nineteen ch",             // boundary: K + W - 1 chars
      "exactly nineteen c",              // one below the boundary
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // all-equal grams -> one fingerprint
      "Mixed CASE Should Lower The Same Way As The Oracle Does")
    val got = samples.toDF("text")
      .select(expr("winnow_fp(lower(text))").as("fp"))
      .collect()
      .map(_.getSeq[Long](0))
    samples.zip(got).foreach { case (s, fps) =>
      assert(fps.toSet == model(s), s"mismatch for: $s")
      assert(fps.distinct.length == fps.length, s"duplicates for: $s")
    }
  }

  test("winnow_fp matches the model on random strings (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    TextExpressions.register(spark)
    val gen = for {
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 1 -> Gen.numChar))
    } yield cs.mkString
    val strings = (1 to 60).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    val got = strings.toDF("text")
      .select(expr("winnow_fp(text)").as("fp")).collect().map(_.getSeq[Long](0))
    strings.zip(got).foreach { case (s, fps) =>
      assert(fps.toSet == model(s), s"mismatch for: '$s'")
    }
  }

  test("q66 plan contains no per-character explode") {
    val plan = operators.TextOps.q66Winnowing(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("posexplode"))
    assert(plan.contains("winnow_fp") || plan.contains("winnowfingerprints"))
    spark.catalog.clearCache()
  }

  test("q66 near-dup pairs are ordered with overlap in (0.5, 1.0]") {
    val rows = operators.TextOps.q66Winnowing(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("da") < r.getAs[Long]("db")))
    assert(rows.forall { r =>
      val o = r.getAs[Double]("overlap"); o >= 0.5 && o <= 1.0
    })
    spark.catalog.clearCache()
  }
}
