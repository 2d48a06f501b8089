package graft

import graft.operators.MonitorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the monitoring/detector-QA tier (q257–q260). */
class MonitorOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q257: LLR accumulates monotonically in events and decisions are consistent") {
    val r = MonitorOps.q257Sprt(spark, sf).collect()
    assert(r.nonEmpty)
    val total = r.map(x => x.getLong(2) + x.getLong(3)).sum
    assert(total == Tables.events(spark, sf).count())
    r.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getDate(1).toString)
      // each day's LLR = previous + n_pos·lnPos + n_neg·lnNeg (exact)
      sorted.foldLeft(0L) { (prev, row) =>
        val expect = prev + row.getLong(2) * MonitorOps.LnPosMicro +
          row.getLong(3) * MonitorOps.LnNegMicro
        assert(row.getLong(4) == expect)
        expect
      }
    }
    r.foreach { row =>
      val (llr, dec) = (row.getLong(4), row.getString(5))
      if (llr >= MonitorOps.LnUpMicro) assert(dec == "accept_h1")
      else if (llr <= MonitorOps.LnLoMicro) assert(dec == "accept_h0")
      else assert(dec == "continue")
    }
  }

  test("q258: Chapman estimate is at least as large as either detector's catch") {
    val row = MonitorOps.q258CaptureRecapture(spark, sf).collect().head
    val (n1, n2, m) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(m <= math.min(n1, n2), "overlap cannot exceed either catch")
    val est = row.getLong(3).toDouble / 1e6
    assert(est + 1e-6 >= math.max(n1, n2) - 1,
      s"estimated population $est must cover the larger catch ($n1, $n2)")
  }

  test("q259: ROC is monotone from (0,0)-ish to (1,1)") {
    val r = MonitorOps.q259Roc(spark, sf).collect()
    assert(r.length >= 2)
    val byThresholdDesc = r.sortBy(-_.getLong(0))
    val tpr = byThresholdDesc.map(_.getLong(3))
    val fpr = byThresholdDesc.map(_.getLong(4))
    assert(tpr.zip(tpr.tail).forall { case (a, b) => a <= b })
    assert(fpr.zip(fpr.tail).forall { case (a, b) => a <= b })
    assert(tpr.last == 1000000L && fpr.last == 1000000L,
      "the lowest threshold accepts everything")
  }

  test("q260: chosen thresholds maximize their criteria over the ROC") {
    val best = MonitorOps.q260Threshold(spark, sf).collect()
    assert(best.length == 2)
    assert(best.map(_.getString(0)).sorted.sameElements(Array("f1", "youden_j")))
    best.foreach { row =>
      assert(row.getLong(2) >= -1000000L && row.getLong(2) <= 1000000L)
      assert(row.getLong(3) >= 0L && row.getLong(3) <= 1000000L)
    }
  }
}
