package graft

import graft.operators.NoveltyOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the corpus-evolution tier (q237–q240). */
class NoveltyOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q237: doc 0 is fully novel; every gram is novel exactly once") {
    val r = NoveltyOps.q237Novelty(spark, sf).collect()
    val first = r.minBy(_.getLong(0))
    assert(first.getLong(1) == first.getLong(2),
      "the earliest doc's grams are all first occurrences")
    assert(first.getLong(3) == 1000000L)
    r.foreach { row =>
      assert(row.getLong(2) <= row.getLong(1))
      assert(row.getLong(3) >= 0 && row.getLong(3) <= 1000000L)
    }
    // Σ novel grams across docs = |distinct grams| (each counted at its first doc)
    val totalNovel = r.map(_.getLong(2)).sum
    val distinctGrams = Tables.documents(spark, sf)
      .select(explode(graft.functions.Portable.kgramHashes(
        graft.functions.Portable.tokenHashes(
          graft.functions.Portable.tokens(col("text"))),
        graft.operators.Curation.ContamK)).as("g"))
      .select("g").distinct().count()
    assert(totalNovel == distinctGrams)
  }

  test("q238: assortativity is a bounded correlation with consistent sums") {
    val row = NoveltyOps.q238Assortativity(spark, sf).collect().head
    val (m, sjk, sj, sj2, r) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(m > 0)
    assert(math.abs(r) <= 1000000L, s"r=$r out of [-1,1]")
    // Cauchy–Schwarz on edge sums: Σjk ≤ Σ(j²+k²)/2
    assert(sjk <= sj2 / 2 + 1)
    assert(sj >= 2 * m, "each endpoint has degree ≥ 1")
  }

  test("q239: dropout keeps ~9/10 tokens deterministically") {
    val r = NoveltyOps.q239Augment(spark, sf)
    val tot = r.agg(sum("n_orig"), sum("n_kept")).collect().head
    val rate = tot.getLong(1).toDouble / tot.getLong(0)
    assert(rate > 0.85 && rate < 0.95, s"keep rate $rate should be ~0.9")
    // deterministic: a second run is byte-identical
    val a = r.collect().map(_.toString)
    val b = NoveltyOps.q239Augment(spark, sf).collect().map(_.toString)
    assert(a.sameElements(b))
    // augmented text token count matches the accounting
    r.collect().foreach { row =>
      val n = if (row.getString(3).isEmpty) 0 else row.getString(3).split(" ").length
      assert(n == row.getLong(2))
    }
  }

  test("q240: growth curve is monotone and concave-ish in vocabulary") {
    val r = NoveltyOps.q240GrowthCurve(spark, sf).collect()
    assert(r.length >= 2)
    val sorted = r.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) > a.getLong(1), "token mass strictly grows")
        assert(b.getLong(2) >= a.getLong(2), "vocabulary never shrinks")
      case _ =>
    }
    // vocab at any checkpoint can't exceed tokens seen
    sorted.foreach(row => assert(row.getLong(2) <= row.getLong(1)))
  }
}
