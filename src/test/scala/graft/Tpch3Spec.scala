package graft

import graft.operators.Tpch3
import org.scalatest.funsuite.AnyFunSuite

/** Plan + invariant checks for the adapted third TPC-H batch
  * (q111 Q4 / q112 Q12 / q113 Q21). Value parity is the DuckDB oracle
  * gate's job; these pin the join shapes the adaptations are built
  * around. */
class Tpch3Spec extends AnyFunSuite {
  import TestSpark._

  test("q111 Q4: EXISTS compiles to a semi join carrying the lateness residual") {
    val df = Tpch3.q111TpchQ4(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(1500))
    // the non-equi lateness condition must ride the join, not a post-filter
    assert(plan.contains("l_shipdate"), plan.take(1500))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("order_count") > 0))
    // quarter slice: strictly fewer qualifying orders than the full table
    assert(rows.map(_.getAs[Long]("order_count")).sum <
      Tables.orders(spark, sf).count())
  }

  test("q112 Q12: high+low partition every joined row; only R/A flags appear") {
    val rows = Tpch3.q112TpchQ12(spark, sf).collect()
    assert(rows.map(_.getAs[String]("l_returnflag")).toSet.subsetOf(Set("R", "A")))
    rows.foreach { r =>
      assert(r.getAs[Long]("high_line_count") >= 0)
      assert(r.getAs[Long]("low_line_count") > 0 || r.getAs[Long]("high_line_count") > 0)
    }
  }

  test("q113 Q21: semi+anti self-joins over the flagged relation; supplier broadcasts") {
    val df = Tpch3.q113TpchQ21(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val rows = df.collect()
    // only nation-9 suppliers can appear, every count positive
    assert(rows.forall(_.getAs[Long]("numwait") > 0))
    val n9 = Tables.supplier(spark, sf)
      .filter(org.apache.spark.sql.functions.col("s_nationkey") === 9).count()
    assert(rows.length <= n9)
  }
}
