package graft

import graft.operators.{Layout, Retrieval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + plan-shape checks for the round-7 retrieval/layout
  * additions: BM25 ranked retrieval (q185), positional phrase search
  * (q186), 2-D skyline (q187), and grid resampling with linear
  * interpolation (q188). Value parity is the DuckDB oracle gate's job;
  * these pin the semantics and plan shapes each operator exists for. */
class RetrievalLayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("q185: scores positive, descending, ties broken by doc_id, ≤20 rows") {
    val rows = Retrieval.q185Bm25(spark, sf)
      .select(col("doc_id"), col("score")).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getDouble(1) > 0))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(1) > b.getDouble(1) ||
        (a.getDouble(1) == b.getDouble(1) && a.getLong(0) < b.getLong(0)))
    case _ => ()
    }
  }

  test("q185: top-k plan is TakeOrderedAndProject, no global Sort") {
    val plan = Retrieval.q185Bm25(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected heap top-k in:\n$plan")
  }

  test("q186: positional-join counts match a substring recount per doc") {
    val got = Retrieval.q186PhraseSearch(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recount on the driver from raw text: adjacent-token scan
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
    val want = docs.map { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      val n = toks.indices.dropRight(1).count(i =>
        toks(i) == Retrieval.PhraseW1 && toks(i + 1) == Retrieval.PhraseW2)
      r.getLong(0) -> n.toLong
    }.filter(_._2 > 0).toMap
    assert(got == want)
  }

  test("q187: skyline members are mutually non-dominating and complete") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def dominated(p: (Long, Double, Long)) = parts.exists { q =>
      q._2 <= p._2 && q._3 <= p._3 && (q._2 < p._2 || q._3 < p._3)
    }
    val want = parts.filterNot(dominated).map(_._1).toSet
    val got = Layout.q187Skyline(spark, sf).select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(got.nonEmpty, "skyline always contains the cheapest part")
  }

  test("q188: ticks on the 4h grid, interpolated values between neighbors") {
    val out = Layout.q188ResampleInterp(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every tick is 4h-aligned from a midnight origin
    assert(out.filter(
      expr("(unix_micros(tick) % (3600000000 * 4)) != 0")).count() == 0)
    // interpolation stays within [min,max] of the user's event values
    val bounds = Tables.events(spark, sf).groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val oob = out.join(bounds, "user_id")
      .filter(col("v") < col("lo") - lit(1e-6) || col("v") > col("hi") + lit(1e-6))
    assert(oob.count() == 0, "linear interp cannot leave the value envelope")
  }

  test("q188: one window shuffle per side, partitioned by user_id only") {
    val plan = Layout.q188ResampleInterp(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected window exec in:\n$plan")
    assert(plan.contains("hashpartitioning(user_id"),
      s"window must partition on user_id:\n$plan")
  }
}
