package graft

import graft.operators.QualityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for data-quality gating (q198) and point-in-time
  * feature/label assembly (q199). */
class QualityOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q198: fixture star schema is clean — all nine checks report zero") {
    val rows = QualityOps.q198RefIntegrity(spark, sf).collect()
    assert(rows.length == 9)
    assert(rows.forall(_.getLong(1) == 0L),
      rows.filter(_.getLong(1) != 0).mkString(", "))
  }

  test("q198 negative: injected orphans and duplicate PKs are counted") {
    val o = Tables.orders(spark, sf)
    // drop some orders → their lineitems become orphans
    val holed = o.filter(col("o_orderkey") % 7 =!= 0)
    val li = Tables.lineitem(spark, sf)
    val expectOrphans = li.join(o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    val got = QualityOps.orphans("t", li, "l_orderkey", holed, "o_orderkey")
      .collect().head.getLong(1)
    assert(got == expectOrphans && got > 0)
    // duplicate a slice of PKs
    val dup = o.unionByName(o.filter(col("o_orderkey") % 11 === 0))
    val expectDups = o.filter(col("o_orderkey") % 11 === 0).count()
    val gotDups = QualityOps.dupPk("t", dup, "o_orderkey").collect().head.getLong(1)
    assert(gotDups == expectDups && gotDups > 0)
  }

  test("q198: FK checks plan as anti-joins, not outer joins") {
    val plan = QualityOps.q198RefIntegrity(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected anti-joins:\n${plan.take(1200)}")
  }

  test("q199: labels never leak — the label window is strictly after the anchor") {
    val ex = QualityOps.q199FeatureLabel(spark, sf).collect()
    assert(ex.nonEmpty)
    val buys = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSet
    ex.foreach { r =>
      val (u, a, label) = (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(4))
      val want = (1 to QualityOps.LabelDays)
        .exists(i => buys.contains((u, a.plusDays(i))))
      assert(label == (if (want) 1L else 0L), s"user $u anchor $a")
      // a purchase ON the anchor day must NOT set the label by itself
    }
    // both label classes occur, so a model could actually train on this
    assert(ex.exists(_.getLong(4) == 1L) && ex.exists(_.getLong(4) == 0L))
  }
}
