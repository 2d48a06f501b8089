package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 graded additions: PII redaction (q59), dynamic partition
  * pruning (q80), JSON source scan (q81). */
class Round4OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q59 plants then fully redacts one email and one phone per document") {
    val rows = operators.TextOps.q59PiiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_emails") == 1, s"doc ${r.get(0)}: email count")
      assert(r.getAs[Int]("n_phones") == 1, s"doc ${r.get(0)}: phone count")
      val red = r.getAs[String]("redacted")
      assert(!red.contains("@"), "email survived redaction")
      assert(!red.contains("+1 555-"), "phone survived redaction")
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]"))
    }
  }

  test("q80 prunes fact partitions dynamically from the dimension filter") {
    val df = operators.PipelineQueries.q80DppJoin(spark, sf)
    val rows = df.collect()
    // Q1 months only — and the scan must carry a runtime pruning filter
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[java.sql.Date]("year_month").toLocalDate.getMonthValue
      assert(m <= 3, s"non-Q1 month survived: $m")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in scan:\n$plan")
  }

  test("q80 matches the statically-filtered equivalent") {
    val viaDpp = operators.PipelineQueries.q80DppJoin(spark, sf)
      .collect().map(_.toString).sorted
    val direct = Tables.orders(spark, sf)
      .filter(quarter(col("o_orderdate")) === 1)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("year_month"))
      .agg(count(lit(1)).as("n"),
        operators.Det.dsum(col("o_totalprice")).as("sum_price"))
      .collect().map(_.toString).sorted
    assert(viaDpp.sameElements(direct))
  }

  test("q82 null-safe join keeps the NULL-key rows a plain equi-join drops") {
    val rows = operators.Joins2.q82NullSafeJoin(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.orders(spark, sf).count(), "every order must survive the join")
    assert(rows.exists(_.getAs[String]("k_label") == "URGENT_NULL"),
      "NULL-key group must be present")
    // the broadcast dim keeps the plan shuffle-free on the probe side
    val plan = operators.Joins2.q82NullSafeJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q83 grid is complete per user, gaps are zero-count, fill is monotone-defined") {
    val rows = operators.EventTime.q83GapFill(spark, sf).collect()
    assert(rows.nonEmpty)
    // contiguous hourly grid per user; filled_sum never null (first hour
    // always has data by construction: the span starts at an active hour)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val hours = rs.map(_.getAs[java.sql.Timestamp]("hour").getTime).sorted
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600000L },
        "grid has holes or duplicates")
    }
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("filled_sum"))))
    // gap rows exist at this sf and carry the previous observed sum
    assert(rows.exists(_.getAs[Long]("n_events") == 0L))
  }

  test("q84 unpivot emits exactly 3 measure rows per lineitem, values intact") {
    val n = Tables.lineitem(spark, sf).count()
    val up = operators.Scalars.q84Unpivot(spark, sf)
    assert(up.count() == 3 * n)
    val measures = up.select("measure").distinct().collect().map(_.getString(0)).sorted
    assert(measures.sameElements(Array("l_discount", "l_extendedprice", "l_quantity")))
  }

  test("q85 moment formulas agree with Spark's builtin estimators to 1e-9") {
    import org.apache.spark.sql.functions.{corr => scorr, stddev_samp, avg}
    val got = operators.Scalars.q85StatsMoments(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val ref = Tables.lineitem(spark, sf).groupBy(col("l_linestatus"))
      .agg(avg(col("l_quantity")).as("m"), stddev_samp(col("l_quantity")).as("s"),
        scorr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (k, g) =>
      val r = ref(k)
      assert(math.abs(g.getAs[Double]("mean_qty") - r.getAs[Double]("m")) < 1e-9)
      assert(math.abs(g.getAs[Double]("std_qty") - r.getAs[Double]("s")) < 1e-9)
      assert(math.abs(g.getAs[Double]("corr_qty_price") - r.getAs[Double]("c")) < 1e-9)
    }
  }

  test("q81 JSON round trip is lossless vs the parquet-direct aggregate") {
    val viaJson = operators.PipelineQueries.q81JsonSource(spark, sf)
      .collect().map(_.toString).sorted
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        operators.Det.dsum(col("value")).as("sum_value"))
      .collect().map(_.toString).sorted
    assert(viaJson.nonEmpty && viaJson.sameElements(direct))
  }
}
