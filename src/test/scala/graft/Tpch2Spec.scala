package graft

import graft.operators.Tpch2
import org.scalatest.funsuite.AnyFunSuite

/** Plan + invariant checks for the second TPC-H batch (q101–q107) and the
  * Gopher-rule filter (q58). Value-level parity is the DuckDB oracle
  * gate's job; these tests pin the physical-plan properties the queries
  * are designed around. */
class Tpch2Spec extends AnyFunSuite {
  import TestSpark._

  test("q101 TPC-H Q5: every dimension join broadcasts; lineitem never shuffles for a join") {
    val df = Tpch2.q101TpchQ5(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val nBhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(nBhj == 5, s"expected 5 broadcast joins, saw $nBhj:\n${plan.take(1000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(1000))
    // locality constraint is part of the customer join key, not a post-filter
    assert(plan.contains("c_custkey") && plan.contains("c_nationkey"), plan.take(1000))
    assert(df.count() > 0)
  }

  test("q103 Q13: zero-order customers survive the outer join; histogram covers all customers") {
    val hist = Tpch2.q103TpchQ13(spark, sf).collect()
    // LEFT OUTER + count(o_orderkey): every customer lands in exactly one
    // bucket, including any with only 1-URGENT orders (c_count = 0)
    val total = hist.map(_.getAs[Long]("custdist")).sum
    assert(total == Tables.customer(spark, sf).count())
  }

  test("q104 Q15: max-revenue supplier equality returns at least one row") {
    val top = Tpch2.q104TpchQ15(spark, sf).collect()
    assert(top.nonEmpty)
    assert(top.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("q106 Q19: disjunctive predicate reaches both scans as pushed filters") {
    val df = Tpch2.q106TpchQ19(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // OR-of-ANDs must be factored into per-scan pushed filters...
    assert(plan.contains("PushedFilters: [IsNotNull(l_partkey), Or(") ||
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*Or\\(.*"), plan.take(1500))
    // ...with one equi-join carrying the residual, not three separate joins
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 1, plan.take(1000))
    assert(df.count() == 1)
  }

  test("q107 Q22: anti-join customers have no urgent orders; all above the positive-balance average") {
    val out = Tpch2.q107TpchQ22(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("numcust") > 0))
  }

  test("q58 Gopher filter: rule passes are bounded by doc counts; pass_all is the intersection") {
    val rows = graft.operators.TextOps.q58GopherFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val passes = Seq("pass_words", "pass_meanlen", "pass_alpha", "pass_stop")
        .map(r.getAs[Long](_))
      passes.foreach(p => assert(p >= 0 && p <= n))
      assert(r.getAs[Long]("pass_all") <= passes.min)
    }
  }
}
