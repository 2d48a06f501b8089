package graft

import graft.operators.SkipOps
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the layout-payoff/integrity tier (q268–q269). */
class SkipOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q268: linear wins its own dimension, curves balance both bands") {
    val r = SkipOps.q268SkipStats(spark, sf).collect()
    assert(r.length == 3 * SkipOps.Probes.length)
    def rows(layout: String) = r.filter(_.getString(0) == layout)
    def tot(layout: String, col: Int) = rows(layout).map(_.getLong(col)).sum
    // linear layout: the x coordinate determines the file, so an x-band
    // probe opens AT MOST one file (zero when the probe misses the
    // observed key range — possible at the smallest fixture)
    assert(rows("linear").forall(_.getLong(3) <= 1))
    // ...and pays for it on y-bands: never better, strictly worse on
    // at least one probe (a y-band hit in linear opens every file)
    assert(tot("linear", 4) >= tot("morton", 4))
    assert(tot("linear", 4) >= tot("hilbert", 4))
    assert(tot("linear", 4) > tot("morton", 4) || tot("linear", 4) > tot("hilbert", 4),
      "some probe must expose linear's unbounded y-band cost")
    // curves never hit every file on a single band probe
    for (l <- Seq("morton", "hilbert"))
      assert(rows(l).forall(row =>
        row.getLong(3) < SkipOps.SkipFiles && row.getLong(4) < SkipOps.SkipFiles))
    // point probes never open more files than either band of the same probe
    r.foreach { row =>
      assert(row.getLong(2) <= row.getLong(3) && row.getLong(2) <= row.getLong(4))
    }
  }

  test("q269: the whitespace tokenizer round-trips and metadata agrees") {
    val r = SkipOps.q269RoundTrip(spark, sf).collect()
    assert(r.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    // the fixture's text is single-space separated: round-trip must hold
    r.foreach { row =>
      assert(row.getLong(2) == row.getLong(1), s"roundtrip drift in ${row.getString(0)}")
      assert(row.getLong(4) == 1000000L)
    }
  }
}
