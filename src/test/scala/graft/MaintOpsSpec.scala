package graft

import graft.operators.{Det, MaintOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for view-maintenance operators: retractable
  * aggregate (q192) and bounded-fan-out sliding distinct (q193). */
class MaintOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q192: maintained aggregate equals direct recompute of the new snapshot") {
    val maintained = MaintOps.q192RetractableAgg(spark, sf).collect()
    val direct = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit("1999-01-01"))
      .filter(col("o_orderkey") % 97 =!= 3)
      .withColumn("price",
        when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 1.1)
          .otherwise(col("o_totalprice")))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), Det.dsum(col("price")).as("spend"))
      .orderBy(col("o_custkey")).collect()
    assert(maintained.map(_.toString).sameElements(direct.map(_.toString)))
  }

  test("q192: the delta actually exercises all three CDC classes") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
    val inserts = o.filter(col("o_orderdate") >= "1998-01-01" &&
      col("o_orderdate") < "1999-01-01" && col("o_orderkey") % 97 =!= 3).count()
    val deletes = o.filter(col("o_orderdate") < "1998-01-01" &&
      col("o_orderkey") % 97 === 3).count()
    val updates = o.filter(col("o_orderdate") < "1998-01-01" &&
      col("o_orderkey") % 97 =!= 3 && col("o_orderkey") % 10 === 0).count()
    assert(inserts > 0 && deletes > 0 && updates > 0,
      s"degenerate fixture: i=$inserts d=$deletes u=$updates")
  }

  test("q193: per-day trailing distinct equals a brute-force recount") {
    val got = MaintOps.q193SlidingDistinct(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val pres = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = pres.map(_._2).distinct
    val want = days.map { d =>
      d.toString -> pres.filter { case (_, t) =>
        !t.isAfter(d) && !t.isBefore(d.minusDays(MaintOps.WindowDays - 1))
      }.map(_._1).distinct.length.toLong
    }.toMap
    assert(got == want)
    // window counts are at least the single-day counts
    val single = pres.groupBy(_._2).map { case (d, xs) => d.toString -> xs.length }
    single.foreach { case (d, n) => assert(got(d) >= n) }
  }
}
