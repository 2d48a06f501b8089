package graft

import graft.operators.MlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + plan-shape checks for the supervised feature-engineering
  * tier (q224–q228). Value parity is the DuckDB oracle gate's job; these
  * pin the statistical semantics and the plan shapes each operator
  * exists for. */
class MlOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q224: smoothed encoding is constant within a category, LOO is not") {
    val enc = MlOps.q224TargetEncode(spark, sf)
    val per = enc.groupBy(col("cat"))
      .agg(countDistinct(col("enc_smooth_micro")).as("ds"),
        countDistinct(col("enc_loo_micro")).as("dl"))
      .collect()
    assert(per.forall(_.getLong(1) == 1L), "smoothed enc must be per-category constant")
    assert(per.exists(_.getLong(2) > 1L), "LOO must differ between y=0 and y=1 rows")
    // smoothing keeps every encoding strictly inside (0, 1)
    val mm = enc.agg(min("enc_smooth_micro"), max("enc_smooth_micro")).collect().head
    assert(mm.getLong(0) > 0L && mm.getLong(1) < 1000000L)
  }

  test("q224: category stats join back by broadcast") {
    val plan = MlOps.q224TargetEncode(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
  }

  test("q225: exactly top-k rows per language, chi2 non-increasing in rank") {
    val r = MlOps.q225Chi2Select(spark, sf).collect()
    val byLang = r.groupBy(_.getString(0))
    assert(byLang.values.forall(_.length == MlOps.ChiTopK))
    byLang.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      val chis = sorted.map(_.getLong(5))
      assert(chis.zip(chis.tail).forall { case (x, y) => x >= y },
        "chi2 must be non-increasing in rank")
    }
    // contingency sanity: presence count never exceeds document frequency
    assert(r.forall(row => row.getLong(3) <= row.getLong(4)))
  }

  test("q226: every held-out doc classified exactly once, into a real class") {
    val docs = Tables.documents(spark, sf)
    val nTest = docs.filter(pmod(col("doc_id"), lit(5)) === 0).count()
    val out = MlOps.q226NaiveBayes(spark, sf)
    assert(out.count() == nTest)
    assert(out.select("doc_id").distinct().count() == nTest)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(out.select("pred").distinct().collect().map(_.getString(0)).toSet.subsetOf(langs))
    // fixture text carries no language signal, so accuracy ~ prior; the
    // invariant worth pinning is that it beats random-uniform over 5 classes
    val acc = out.agg(avg(col("correct").cast("double"))).collect().head.getDouble(0)
    assert(acc > 1.0 / langs.size, s"accuracy $acc at or below uniform-random")
  }

  test("q227: bins partition all orders; Murphy terms are non-negative") {
    val r = MlOps.q227Calibration(spark, sf).collect()
    val n = Tables.orders(spark, sf).count()
    assert(r.map(_.getLong(1)).sum == n, "bin counts must partition the orders")
    assert(r.forall(row => row.getLong(3) >= 0 && row.getLong(3) <= 1000000L))
    assert(r.forall(row => row.getLong(5) >= 0 && row.getLong(6) >= 0))
    val bins = r.map(_.getLong(0))
    assert(bins.distinct.length == bins.length && bins.forall(b => b >= 0 && b < MlOps.CalBins))
  }

  test("q228: contingency sums to n; kappa bounded; overall row aggregates sources") {
    val r = MlOps.q228CohenKappa(spark, sf).collect()
    r.foreach { row =>
      assert(row.getLong(2) + row.getLong(3) + row.getLong(4) + row.getLong(5) == row.getLong(1))
      if (!row.isNullAt(8))
        assert(math.abs(row.getLong(8)) <= 1000000L, "kappa must be in [-1, 1]")
    }
    val overall = r.filter(_.getString(0) == "__all__")
    assert(overall.length == 1)
    assert(overall.head.getLong(1) == r.filter(_.getString(0) != "__all__").map(_.getLong(1)).sum)
    // both annotators must actually split the fixture (non-degenerate table)
    assert(overall.head.getLong(2) > 0 && overall.head.getLong(5) > 0 &&
      (overall.head.getLong(3) > 0 || overall.head.getLong(4) > 0))
  }
}
