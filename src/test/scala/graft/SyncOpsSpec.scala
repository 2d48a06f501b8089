package graft

import graft.operators.SyncOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + plan-shape checks for the replica-sync/placement trio:
  * block-checksum diff (q189), KMV source Jaccard (q190), rendezvous
  * sharding (q191). Value parity is the DuckDB oracle gate's job. */
class SyncOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q189: diff statuses exactly mirror the synthetic drift moduli") {
    val rows = SyncOps.q189BlockDiff(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0))
    val missing = keys.filter(_ % 1009 == 0).toSet
    val changed = keys.filter(k => k % 997 == 0 && k % 1009 != 0).toSet
    assert(rows.collect { case (k, "missing_in_replica") => k }.toSet == missing)
    assert(rows.collect { case (k, "changed") => k }.toSet == changed)
    assert(!rows.exists(_._2 == "extra_in_replica"), "drift only removes/changes")
    assert(rows.length == missing.size + changed.size)
  }

  test("q189: row-level diff is gated behind the block mismatch (semi-joins in plan)") {
    val plan = SyncOps.q189BlockDiff(spark, sf).queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join block gate in:\n${plan.take(1500)}")
  }

  test("q190: KMV estimate tracks exact Jaccard within the sketch error band") {
    val rows = SyncOps.q190SourceJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(2), r.getDouble(3))
      assert(est >= 0.0 && est <= 1.0)
      assert(exact >= 0.0 && exact <= 1.0)
      // k=64 ⇒ σ ≈ 1/√64 = 0.125; 3σ band
      assert(math.abs(est - exact) < 0.375,
        s"${r.getString(0)}/${r.getString(1)}: est=$est exact=$exact")
    }
  }

  test("q191: every doc assigned once; movement ≈ 1/(k+1) of the corpus") {
    val rows = SyncOps.q191Rendezvous(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val moved = rows.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sf).count())
    val expect = total.toDouble / SyncOps.ShardsAfter
    assert(moved > 0 && moved < 3 * expect,
      s"moved=$moved, rendezvous minimum-movement expectation ≈ $expect")
    // shard ids are a subset of 0..10
    assert(rows.map(_.getLong(0)).forall(s => s >= 0 && s < SyncOps.ShardsAfter))
  }
}
