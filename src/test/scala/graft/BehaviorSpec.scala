package graft

import graft.operators.Behavior
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the behavioral-analytics tier (q122–q126).
  * Value parity is the DuckDB oracle gate's job. */
class BehaviorSpec extends AnyFunSuite {
  import TestSpark._

  test("q122 funnel: step counts shrink monotonically and never exceed the user base") {
    val r = Behavior.q122Funnel(spark, sf).collect()(0)
    val (v, c, p) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"),
      r.getAs[Long]("n_purchase"))
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(v >= c && c >= p && p >= 0)
    assert(v <= users)
  }

  test("q122 funnel is strictly ordered: conversions <= unordered type co-occurrence") {
    // unordered upper bound: users having all three types at any times
    val loose = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy("user_id")
      .agg(countDistinct(col("event_type")).as("k"))
      .filter(col("k") === 3).count()
    val p = Behavior.q122Funnel(spark, sf).collect()(0).getAs[Long]("n_purchase")
    assert(p <= loose)
  }

  test("q123 inverted index: df <= tf, postings capped at 10 and sorted ascending") {
    val rows = Behavior.q123InvertedIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      assert(df <= r.getAs[Long]("tf") && df >= 1)
      val posting = r.getAs[String]("postings").split(',').map(_.toLong)
      assert(posting.length <= 10 && posting.length == posting.distinct.length)
      assert(posting.sameElements(posting.sorted))
      assert(posting.length == math.min(df, 10L))
    }
  }

  test("smallest_k equals unbounded collect_set+sort+slice on every group") {
    import spark.implicits._
    graft.functions.AggExpressions.register(spark)
    // 1000 values across 7 groups, with duplicates — far more than k=10
    val df = (0 until 1000).map(i => (i % 7, (i * 37 % 211).toLong)).toDF("g", "v")
    val got = df.groupBy("g").agg(expr("smallest_k(v, 10)").as("topk"))
    val want = df.groupBy("g")
      .agg(expr("slice(sort_array(collect_set(v)), 1, 10)").as("topk"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // groups smaller than k return all their distinct values
    val tiny = Seq((1, 5L), (1, 5L), (1, 2L)).toDF("g", "v")
      .groupBy("g").agg(expr("smallest_k(v, 10)").as("topk"))
      .collect()(0).getSeq[Long](1)
    assert(tiny == Seq(2L, 5L))
  }

  test("q124 snapshot diff: classes partition the key universe") {
    val rows = Behavior.q124SnapshotDiff(spark, sf).collect()
      .map(r => r.getAs[String]("class") -> r.getAs[Long]("n")).toMap
    val o = Tables.orders(spark, sf)
    val nA = o.filter(col("o_orderdate") < lit("1998-01-01")).count()
    val nB = o.filter(col("o_orderdate") < lit("1999-01-01"))
      .filter(col("o_orderkey") % 97 =!= 3).count()
    // |A ∪ B| = delete+same+update+insert; A = delete+same+update
    assert(rows.getOrElse("delete", 0L) + rows.getOrElse("same", 0L) +
      rows.getOrElse("update", 0L) == nA)
    assert(rows.getOrElse("insert", 0L) + rows.getOrElse("same", 0L) +
      rows.getOrElse("update", 0L) == nB)
    assert(rows.getOrElse("update", 0L) > 0 && rows.getOrElse("delete", 0L) > 0)
  }

  test("q125 retention: offset-0 count equals cohort size; actives never exceed it") {
    val rows = Behavior.q125RetentionCohort(spark, sf).collect()
    val base = rows.filter(_.getAs[Int]("month_offset") == 0)
      .map(r => r.getAs[String]("cohort") -> r.getAs[Long]("n_active")).toMap
    // every customer appears in their own cohort's month 0
    assert(base.values.sum == Tables.orders(spark, sf)
      .select("o_custkey").distinct().count())
    rows.foreach { r =>
      assert(r.getAs[Int]("month_offset") >= 0)
      assert(r.getAs[Long]("n_active") <= base(r.getAs[String]("cohort")))
    }
  }

  test("q129 transitions: rows sum to events minus users; probabilities sum to 1 per row-type") {
    val rows = Behavior.q129Transitions(spark, sf).collect()
    val nTrans = rows.map(_.getAs[Long]("n")).sum
    val ev = Tables.events(spark, sf)
    val nUsersWithEvents = ev.select("user_id").distinct().count()
    // each user contributes (events - 1) transitions
    assert(nTrans == ev.count() - nUsersWithEvents)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, grp) =>
      val pSum = grp.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-9)
    }
  }

  test("q130 stickiness: wau >= dau, stickiness in (0,1], first day has wau == dau") {
    val rows = Behavior.q130Stickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"))
      assert(wau >= dau && dau > 0)
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
    // the first day's trailing window contains only itself
    val first = rows.minBy(_.getAs[java.sql.Date]("day").getTime)
    assert(first.getAs[Long]("wau") == first.getAs[Long]("dau"))
  }

  test("q131 spike detect: ratio = n/prev; spike flag consistent with 1.5x threshold") {
    val rows = Behavior.q131SpikeDetect(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = r.getAs[Long]("n").toDouble / r.getAs[Long]("prev").toDouble
      assert(math.abs(r.getAs[Double]("ratio") - expect) == 0.0)
      assert(r.getAs[Int]("spike") == (if (expect >= 1.5) 1 else 0))
    }
  }

  test("q142 weighted sample: 5 per source, reproducible, length-biased vs uniform") {
    val a = Behavior.q142WeightedSample(spark, sf).collect()
    val b = Behavior.q142WeightedSample(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString))) // pure function of content
    val meanAll = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).collect()(0).getDouble(0)
    val (sampChars, sampN) =
      (a.map(_.getAs[Long]("chars_sampled")).sum, a.map(_.getAs[Long]("n_sampled")).sum)
    a.foreach(r => assert(r.getAs[Long]("n_sampled") == 5))
    // w = n_chars biases the sample long: its mean length beats the corpus mean
    assert(sampChars.toDouble / sampN > meanAll)
  }

  test("q143 A/B readout: arms partition users; cvr consistent with counts") {
    val rows = Behavior.q143AbReadout(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("arm")).toSeq == Seq(0L, 1L))
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_users"))
      assert(math.abs(r.getAs[Double]("cvr") -
        r.getAs[Long]("n_converted").toDouble / r.getAs[Long]("n_users")) < 1e-12)
    }
  }

  test("q146 attribution: conversions partition purchases; attributed types never 'purchase'") {
    val rows = Behavior.q146Attribution(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_conversions")).sum
    val purchases = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(total == purchases)
    val types = rows.map(_.getAs[String]("attributed")).toSet
    assert(!types.contains("purchase"))
    assert(types.subsetOf(Set("view", "click", "signup", "error", "none")))
  }

  test("q126 bitmask: profiles lie in [1,31]; user counts sum to the user base") {
    val rows = Behavior.q126BitmaskProfile(spark, sf).collect()
    rows.foreach { r =>
      val p = r.getAs[Long]("profile")
      assert(p >= 1L && p <= 31L)
    }
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
  }
}
