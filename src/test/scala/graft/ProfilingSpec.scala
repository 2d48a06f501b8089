package graft

import graft.operators.Profiling
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the profiling tier (q133/q134).
  * Value parity is the DuckDB oracle gate's job. */
class ProfilingSpec extends AnyFunSuite {
  import TestSpark._

  test("q133 profile: one row per column; distincts and nulls bounded by row count") {
    val rows = Profiling.q133Profile(spark, sf).collect()
    assert(rows.map(_.getAs[String]("col_name")).toSeq ==
      Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
    val n = Tables.orders(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") >= 0 && r.getAs[Long]("n_nulls") <= n)
      assert(r.getAs[Long]("n_distinct") >= 1 && r.getAs[Long]("n_distinct") <= n)
      if (!r.isNullAt(r.fieldIndex("min_val")))
        assert(r.getAs[Double]("min_val") <= r.getAs[Double]("max_val"))
    }
    // the key column is unique and never null
    val key = rows.find(_.getAs[String]("col_name") == "o_orderkey").get
    assert(key.getAs[Long]("n_distinct") == n && key.getAs[Long]("n_nulls") == 0)
  }

  test("q135 SQL API: CTE+window SQL text plans and runs; deltas telescope to last revenue") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Relational.q135SqlApi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("l_linestatus")).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_.getAs[java.sql.Timestamp]("mon").getTime)
      // lag default 0.0 on the first row: delta telescoping recovers the
      // final month's revenue exactly (all-double arithmetic)
      val sumDeltas = sorted.map(_.getAs[Double]("mom_delta")).sum
      assert(math.abs(sumDeltas - sorted.last.getAs[Double]("revenue")) < 1e-6)
    }
  }

  test("q136 map ops: derived key doubles the base; counts equal the event count") {
    val rows = graft.operators.Scalars.q136MapOps(spark, sf).collect()
      .map(r => r.getAs[String]("key") -> (r.getAs[Long]("n"), r.getAs[Long]("total"))).toMap
    val n = Tables.events(spark, sf).count()
    assert(rows.keySet == Set("k", "k2"))
    assert(rows("k")._1 == n && rows("k2")._1 == n)
    assert(rows("k2")._2 == 2 * rows("k")._2)
  }

  test("q137 int8 quant: error bounded by half a quantization step per dim") {
    val rows = graft.operators.PqOps.q137Int8Quant(spark, sf).collect()
    assert(rows.length == 64)
    val flat = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.posexplode(
        org.apache.spark.sql.functions.col("embedding")).as(Seq("dim", "x")))
      .collect().map(r => (r.getInt(0), r.getFloat(1).toDouble))
    val bounds = flat.groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).min, xs.map(_._2).max)).toMap
    rows.foreach { r =>
      val dim = r.getAs[Int]("dim")
      val (mn, mx) = bounds(dim)
      val step = (mx - mn) / 255.0
      // round-to-nearest quantization: |err| <= step/2; max_err is
      // reported rounded to 6 dp, so allow the half-ulp of that rounding
      assert(r.getAs[Double]("max_err") <= step / 2 + 5e-7)
      assert(r.getAs[Double]("avg_err") <= r.getAs[Double]("max_err"))
    }
  }

  test("q138 skew diag: descending counts, share and salt consistent") {
    val rows = graft.operators.Profiling.q138SkewDiag(spark, sf).collect()
    assert(rows.length == 10)
    val total = Tables.orders(spark, sf).count()
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("n") >= b.getAs[Long]("n"))
      case _ => ()
    }
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(math.abs(r.getAs[Double]("share") - n.toDouble / total) < 1e-12)
      assert(r.getAs[Long]("salt_factor") ==
        math.max(1L, math.ceil(n.toDouble / (total / 32.0)).toLong))
    }
  }

  test("q139 lateral: <=2 orders per customer, sorted within; decorrelates to a set plan") {
    val df = graft.operators.Relational.q139Lateral(spark, sf)
    val rows = df.collect()
    rows.groupBy(_.getAs[Long]("c_custkey")).foreach { case (_, grp) =>
      assert(grp.length <= 2)
      val prices = grp.map(_.getAs[Double]("o_totalprice"))
      assert(prices.sorted.reverse.sameElements(prices))
    }
    // the naive correlated spelling must plan as a group-limit, not a loop
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("q140 try semantics: prefix always parses, full string never, div-null matches key mod") {
    val rows = graft.operators.Scalars.q140TrySemantics(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_prefix_ok") == r.getAs[Long]("n"))
      assert(r.getAs[Long]("n_full_ok") == 0L)
      assert(r.getAs[Long]("n_div_null") >= 0)
    }
  }

  test("q144 z-score: outliers rare, z extremes straddle zero, counts partition") {
    val rows = graft.operators.Profiling.q144ZscoreOutliers(spark, sf).collect()
    assert(rows.length == 5)
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n_rows") / 10)
      assert(r.getAs[Double]("min_z") < 0.0 && r.getAs[Double]("max_z") > 0.0)
    }
  }

  test("q145 deciles: equal-population buckets, contiguous bands, edge_pr increasing") {
    val rows = graft.operators.Profiling.q145Deciles(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val counts = rows.map(_.getAs[Long]("n"))
    assert(counts.max - counts.min <= 1) // ntile balance
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
        assert(a.getAs[Double]("edge_pr") < b.getAs[Double]("edge_pr"))
      case _ => ()
    }
  }

  test("q134 histogram: buckets tile [min,max], counts sum to row count") {
    val rows = Profiling.q134Histogram(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bucket")).forall(b => b >= 0 && b <= 9))
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.orders(spark, sf).count())
    // contiguous buckets share boundaries
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("bucket") > a.getAs[Long]("bucket"))
        if (b.getAs[Long]("bucket") == a.getAs[Long]("bucket") + 1)
          assert(math.abs(a.getAs[Double]("hi") - b.getAs[Double]("lo")) < 1e-9)
      case _ => ()
    }
  }
}
