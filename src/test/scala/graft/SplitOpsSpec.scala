package graft

import graft.operators.SplitOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the split/drift/lineage tier (q248–q251). */
class SplitOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q248: the three splits partition all events; embargo is non-empty") {
    val r = SplitOps.q248PurgedSplit(spark, sf).collect()
    val total = r.map(x => x.getLong(1) + x.getLong(2) + x.getLong(3)).sum
    assert(total == Tables.events(spark, sf).count())
    assert(r.map(_.getLong(2)).sum > 0, "a 1-day embargo on a 30-day range must purge rows")
    assert(r.map(_.getLong(1)).sum > r.map(_.getLong(3)).sum,
      "train (70%) must outweigh test")
    r.foreach(row => assert(row.getLong(4) >= 0))
  }

  test("q249: shares are proper distributions; PSI terms have the right sign structure") {
    val r = SplitOps.q249Psi(spark, sf).collect()
    assert(r.length == SplitOps.PsiBins ||
      r.length < SplitOps.PsiBins && r.nonEmpty)
    // smoothed shares sum to ~1 on each side
    val (sp, sq) = (r.map(_.getLong(3)).sum, r.map(_.getLong(4)).sum)
    assert(math.abs(sp - 1000000L) <= r.length && math.abs(sq - 1000000L) <= r.length)
    // each PSI term is non-negative up to rounding: (p−q) and ln(p/q) share sign
    r.foreach(row => assert(row.getLong(5) >= -1))
  }

  test("q250: provenance hashes are unique per row and reproducible") {
    val a = SplitOps.q250Provenance(spark, sf).collect()
    assert(a.nonEmpty)
    // the fixture carries duplicate PK rows by design (q73's reason to
    // exist) — identical tuples MUST hash identically, distinct ones
    // distinctly: #distinct hashes == #distinct key tuples
    val distinctTuples = a.map(r => (r.getLong(0), r.getLong(1))).distinct.length
    assert(a.map(_.getString(2)).distinct.length == distinctTuples,
      "distinct key tuples must hash distinctly, duplicates identically")
    assert(a.forall(_.getString(2).matches("[0-9a-f]{32}")))
    val b = SplitOps.q250Provenance(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("q251: merged registers estimate equals the direct estimate exactly") {
    val row = SplitOps.q251HllMerge(spark, sf).collect().head
    assert(row.getBoolean(3), "HLL merge must be lossless")
    assert(row.getDouble(0) == row.getDouble(1))
    // the estimate is in the right ballpark of the exact cardinality
    val (est, exact) = (row.getDouble(0), row.getLong(2).toDouble)
    assert(est > exact * 0.5 && est < exact * 2.0,
      s"estimate $est vs exact $exact out of the m=64 error envelope")
  }
}
