package graft

import graft.operators.DedupQa
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the dedup-QA tier (q261–q262). */
class DedupQaSpec extends AnyFunSuite {
  import TestSpark._

  test("q261: pair accounting is complete and size-2 clusters are always direct") {
    val r = DedupQa.q261ChainMerge(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (csize, nc, np, nd, nch) =
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      assert(nd + nch == np, "direct + chained must partition the pairs")
      assert(np == nc * csize * (csize - 1) / 2,
        s"pair count must be clusters x C(size,2): $np vs ${nc} x C($csize,2)")
      // a 2-cluster comes from one verified edge — it cannot be chained
      if (csize == 2) assert(nch == 0, "size-2 clusters are direct by construction")
    }
  }

  test("q262: FPR accounting is consistent and theory tracks the fill fraction") {
    val row = DedupQa.q262BloomFpr(spark, sf).collect().head
    val (m, k, bits, fill, emp, theory) =
      (row.getLong(0), row.getLong(1), row.getLong(3), row.getLong(4),
        row.getLong(5), row.getLong(6))
    assert(m == 4096 && k == 3)
    assert(bits > 0 && bits <= m)
    assert(math.abs(fill - math.floor(bits.toDouble / m * 1e6 + 0.5).toLong) <= 1)
    assert(emp >= 0 && emp <= 1000000L)
    // the analytic rate is fill^k — and empirical should be the same
    // order of magnitude (within 5× either way at this geometry)
    assert(theory > 0)
    assert(emp < theory * 5 && theory < emp * 5 + 1,
      s"empirical $emp vs theory $theory diverge beyond hash-quality tolerance")
  }
}
