package graft

import graft.operators.AnnAudit
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the q247 IVF recall curve. */
class AnnAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("q247: recall and candidate count are monotone in nprobe") {
    val r = AnnAudit.q247IvfRecall(spark, sf).collect()
    assert(r.nonEmpty)
    val byQ = r.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(AnnAudit.Probes.map(_.toLong)))
      val cands = sorted.map(_.getLong(2))
      val recalls = sorted.map(_.getLong(4))
      assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
        "probing more cells can only add candidates")
      assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
        "recall is monotone in nprobe")
      recalls.foreach(x => assert(x >= 0 && x <= 1000000L))
    }
    // the curve must not be flat at zero (the index finds something)
    assert(r.map(_.getLong(4)).max > 0)
  }
}
