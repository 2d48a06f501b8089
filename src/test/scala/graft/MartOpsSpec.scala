package graft

import graft.operators.MartOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the mart/baseline/normalization tier (q252–q254). */
class MartOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q252: scorecard covers every source with consistent volume accounting") {
    val r = MartOps.q252SourceScorecard(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(r.length == docs.select("source").distinct().count())
    assert(r.map(_.getLong(1)).sum == docs.count())
    r.foreach { row =>
      assert(row.getLong(4) >= 0 && row.getLong(4) < row.getLong(1)) // dups < docs
      assert(row.getLong(5) >= 0 && row.getLong(5) <= 1000000L)
      assert(row.getLong(6) >= 0, "entropy is non-negative")
      // entropy bounded by ln(#langs) ≈ 1.61 for 5 langs
      assert(row.getLong(6) <= 1700000000L)
    }
  }

  test("q253: markov baseline beats uniform-random on held-out transitions") {
    val r = MartOps.q253MarkovAccuracy(spark, sf).collect()
    assert(r.nonEmpty)
    val nTypes = Tables.events(spark, sf).select("event_type").distinct().count()
    val (n, correct) = (r.map(_.getLong(1)).sum, r.map(_.getLong(2)).sum)
    assert(correct <= n)
    assert(correct.toDouble / n >= 1.0 / nTypes * 0.8,
      "argmax prediction should not do materially worse than uniform")
    r.foreach(row => assert(row.getLong(3) >= 0 && row.getLong(3) <= 1000000L))
  }

  test("q254: CDFs are monotone in length and end at 1") {
    val r = MartOps.q254QuantileNorm(spark, sf).collect()
    assert(r.length == Tables.documents(spark, sf).count())
    // global CDF must be monotone when sorted by length
    val byLen = r.sortBy(x => (x.getLong(2), x.getLong(0)))
    val g = byLen.map(_.getLong(4))
    assert(g.zip(g.tail).forall { case (a, b) => a <= b })
    assert(g.last == 1000000L, "the longest doc sits at CDF 1")
    // per-source monotonicity too
    r.groupBy(_.getString(1)).values.foreach { rows =>
      val sorted = rows.sortBy(x => (x.getLong(2), x.getLong(0)))
      val c = sorted.map(_.getLong(3))
      assert(c.zip(c.tail).forall { case (a, b) => a <= b })
      assert(c.last == 1000000L)
    }
  }
}
