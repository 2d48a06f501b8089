package graft

import graft.operators.{GraphOps, Profiling, Retrieval, ScaleOps2}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-7 analytics additions: weighted SSSP
  * (q203), retrieval evaluation metrics (q204), dependency discovery
  * (q205), MAD outliers (q206), and the Count-Min sketch (q207). Value
  * parity with DuckDB is the oracle gate's job; these pin the semantics
  * each operator guarantees — q203 and q206 against brute-force
  * re-derivations, q205 against the fixture's known FKs, q207 against
  * CMS's one-sided error theorem. */
class Round7AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("q203: matches a driver-side Bellman-Ford on the same edges") {
    val got = GraphOps.q203SsspWeighted(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild edges brute-force: supplier pairs sharing an order
    val ls = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = ls.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val cnt = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    byOrder.values.foreach { sup =>
      for (i <- sup.indices; j <- i + 1 until sup.size)
        cnt.updateWith((sup(i), sup(j)))(c => Some(c.getOrElse(0L) + 1))
    }
    val edges = cnt.toSeq.flatMap { case ((u, v), c) =>
      val w = math.max(1L, 1000000L / c)
      Seq((u, v, w), (v, u, w))
    }
    val src = Tables.supplier(spark, sf).agg(min("s_suppkey")).collect().head.getLong(0)
    var dist = Map(src -> 0L)
    for (_ <- 1 to GraphOps.SsspRounds) {
      val relaxed = edges.flatMap { case (u, v, w) => dist.get(u).map(du => v -> (du + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    }
    assert(got == dist, s"got ${got.size} nodes, expected ${dist.size}")
    assert(got(src) == 0L)
  }

  test("q204: metric bounds and internal consistency hold per query term") {
    val rows = Retrieval.q204RetrievalEval(spark, sf).collect()
    assert(rows.length == Retrieval.QueryTerms.size)
    rows.foreach { r =>
      val (nRel, hits10) = (r.getLong(1), r.getLong(2))
      val (p10, r10, rr) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(hits10 <= math.min(10L, nRel))
      assert(p10 >= 0.0 && p10 <= 1.0)
      assert(r10 >= 0.0 && r10 <= 1.0)
      assert(rr >= 0.0 && rr <= 1.0)
      assert(p10 == hits10 / 10.0)
      if (nRel > 0) assert(rr > 0.0, "relevant docs exist, so some rank must be hit")
    }
  }

  test("q205: declared FKs score coefficient 1.0; all coefficients in [0,1]") {
    val rows = Profiling.q205DependencyAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.size == 7)
    Seq("ind_l_orderkey_in_o_orderkey", "ind_o_custkey_in_c_custkey",
      "ind_l_partkey_in_p_partkey").foreach { fk =>
      assert(rows(fk)._2 == 0L, s"$fk should have no orphans")
      assert(rows(fk)._3 == 1.0)
    }
    rows.foreach { case (chk, (lhs, viol, coef)) =>
      assert(lhs > 0 && viol >= 0 && viol <= lhs, chk)
      assert(coef >= 0.0 && coef <= 1.0, chk)
    }
  }

  test("q206: median/MAD/outliers match a driver-side recompute") {
    val got = Profiling.q206MadOutliers(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1e6 + 0.5).toLong))
    def med2(vs: Seq[Long]): Long = {
      val s = vs.sorted; val n = s.size
      s((n + 1) / 2 - 1) + s(n / 2)
    }
    raw.groupBy(_._1).foreach { case (et, xs) =>
      val vs = xs.map(_._2).toSeq
      val m2 = med2(vs)
      val devs = vs.map(v => math.abs(2 * v - m2))
      val mad2 = med2(devs)
      val nOut = devs.count(_ > 3 * mad2)
      val (n, med, mad, out) = got(et)
      assert(n == vs.size, et)
      assert(med == m2.toDouble / 2000000.0, et)
      assert(mad == mad2.toDouble / 2000000.0, et)
      assert(out == nOut.toLong, et)
    }
  }

  test("q208: two BPE merge rounds match a driver-side trainer") {
    import graft.operators.Curation
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.functions.Portable.tokens(col("text"))).as("tok"))
      .collect().map(_.getString(0))
    val freq = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    def pairCounts(words: Map[String, Long]): Map[String, Long] = {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, f) =>
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          m.update(p, m.getOrElse(p, 0L) + f)
        }
      }
      m.toMap
    }
    def best(pc: Map[String, Long]): (String, Long) =
      pc.toSeq.maxBy { case (p, c) => (c, p) }(
        Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
    // explicit greedy leftmost non-overlapping BPE merge scan — the
    // definition; the operator uses replace(), which must coincide
    def mergeScan(w: String, l: Char, r: Char, m: Char): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == l && w(i + 1) == r) { sb += m; i += 2 }
        else { sb += w(i); i += 1 }
      }
      sb.toString
    }
    val (bp1, cnt1) = best(pairCounts(freq))
    val marker = Curation.BpeMarker.head
    freq.keys.foreach { w =>
      assert(w.replace(bp1, Curation.BpeMarker) ==
        mergeScan(w, bp1(0), bp1(1), marker),
        s"replace() diverges from the BPE merge scan on '$w'")
    }
    val freq1 = freq.toSeq
      .map { case (w, f) => (w.replace(bp1, Curation.BpeMarker), f) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val (bp2, cnt2) = best(pairCounts(freq1))
    def unfold(c: Char): String =
      if (c == marker) bp1 else c.toString
    val rows = Curation.q208BpeMerges(spark, sf).collect()
    assert(rows.length == 2)
    assert((rows(0).getString(1), rows(0).getString(2), rows(0).getLong(3)) ==
      (bp1(0).toString, bp1(1).toString, cnt1))
    assert((rows(1).getString(1), rows(1).getString(2), rows(1).getLong(3)) ==
      (unfold(bp2(0)), unfold(bp2(1)), cnt2))
  }

  test("q209: KS statistic matches a driver-side CDF recompute") {
    val got = Profiling.q209KsDrift(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1e6 + 0.5).toLong,
        r.getLong(2) % 2 == 0))
    raw.groupBy(_._1).foreach { case (et, xs) =>
      val a = xs.filter(_._3).map(_._2).sorted
      val b = xs.filterNot(_._3).map(_._2).sorted
      val ksNum = (a ++ b).distinct.map { v =>
        math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)
      }.max
      assert(got(et) == ((a.length.toLong, b.length.toLong, ksNum)), et)
    }
  }

  test("q210: EWMA equals the sequential recurrence on ordered daily counts") {
    import graft.operators.EventTime
    val got = EventTime.q210Ewma(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, xs) =>
      val series = xs.sortBy(_._2.getTime).map(_._3.toDouble)
      val ewma = series.tail.foldLeft(series.head)((acc, x) => acc * 0.5 + x * 0.5)
      val (nDays, gotEwma) = got(et)
      assert(nDays == series.length, et)
      assert(gotEwma == ewma, s"$et: $gotEwma != $ewma")
    }
  }

  test("q211: Benford audit partitions the rows and conserves expectation") {
    val rows = Profiling.q211Benford(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n, "every order has exactly one first digit")
    assert(math.abs(rows.map(_.getDouble(2)).sum - n) < 1e-6,
      "Benford probabilities must sum to 1")
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("q212: allocations are capped, exhaust the budget exactly, and fund small sources fully") {
    import graft.operators.Curation
    val rows = Curation.q212WaterFilling(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val tot = rows.map(_._2).sum
    val budget = tot / 2
    assert(rows.map(_._3).sum == budget, "water level must spend the budget exactly")
    rows.foreach { case (src, cap, alloc, funded) =>
      assert(alloc >= 0 && alloc <= cap, src)
      if (funded) assert(alloc == cap, s"$src is funded, so it contributes everything")
    }
    // every funded supply is <= every capped source's allocation floor
    val fundedCaps = rows.filter(_._4).map(_._2)
    val cappedAllocs = rows.filterNot(_._4).map(_._3)
    if (fundedCaps.nonEmpty && cappedAllocs.nonEmpty)
      assert(fundedCaps.max <= cappedAllocs.min,
        "water level sits above every fully-funded supply")
  }

  test("q213: covariance matches a driver-side recompute from raw embeddings") {
    import graft.operators.FeatureOps
    val got = FeatureOps.q213Covariance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val embs = Tables.embeddings(spark, sf).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val n = embs.length
    val dim = embs.head.length
    assert(got.size == dim * (dim + 1) / 2)
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    // spot-check a diagonal and two off-diagonal cells exactly
    for ((i, j) <- Seq((0, 0), (0, 1), (3, 17), (dim - 1, dim - 1))) {
      val sxy = embs.map(e => micro(e(i).toDouble * e(j).toDouble)).sum
      val sx = embs.map(e => micro(e(i).toDouble)).sum
      val sy = embs.map(e => micro(e(j).toDouble)).sum
      val mx = sx.toDouble / n / 1e6
      val my = sy.toDouble / n / 1e6
      val expect = math.floor(sxy.toDouble / n - mx * my * 1e6 + 0.5).toLong
      assert(got((i.toLong, j.toLong)) == expect, s"($i,$j)")
    }
    // diagonal cells are variances: non-negative (up to quantization)
    (0 until dim).foreach(i => assert(got((i.toLong, i.toLong)) >= -1L, s"var($i)"))
  }

  test("q214: skip-gram pairs match a driver-side window scan") {
    import graft.operators.CorpusOps
    val got = CorpusOps.q214SkipgramCooc(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val docs = Tables.documents(spark, sf).select(col("text")).collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty))
    val acc = scala.collection.mutable.HashMap.empty[(String, String), (Long, Long)]
    docs.foreach { ts =>
      for (i <- ts.indices; off <- 1 to CorpusOps.SkipWindow if i + off < ts.length) {
        val (a, b) = (ts(i), ts(i + off))
        val key = if (a <= b) (a, b) else (b, a)
        val (n, w) = acc.getOrElse(key, (0L, 0L))
        acc.update(key, (n + 1, w + CorpusOps.skipWeight(off)))
      }
    }
    val expected = acc.toSeq
      .map { case ((a, b), (n, w)) => (a, b, n, w) }
      .sortBy { case (a, b, _, w) => (-w, a, b) }
      .take(50)
      .map { case (a, b, n, w) => (a, b, n, w.toDouble / 1e6) }
    assert(got.toSeq == expected)
  }

  test("q215: predictions are majority votes of in-cell labeled neighbors") {
    import graft.operators.VectorOps
    val rows = VectorOps.q215LabelProp(spark, sf).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (vid, pred, truth, correct) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(vid % 5 == 0, "only masked vectors get predictions")
      assert(truth == labels(vid), "true label survives the mask")
      assert(labels.values.exists(_ == pred), "prediction is a real label")
      assert(correct == (if (pred == truth) 1 else 0))
    }
  }

  test("q216: U-shaped credit sums to one per attributed conversion") {
    import graft.operators.Behavior
    val rows = Behavior.q216MultitouchAttribution(spark, sf).collect()
    val credit = rows.map(_.getDouble(3)).sum
    // conversions with >= 1 touch in the window, recomputed directly
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2)
    val win = 30L * 60 * 1000000
    val attributed = byUser.values.map { es =>
      val convs = es.filter(_._3 == "purchase")
      val touches = es.filter(_._3 != "purchase")
      convs.count(c => touches.exists(t => t._4 <= c._4 && c._4 - t._4 <= win))
    }.sum
    // per-touch 6-dp quantization bounds the drift at 5e-7 per touch
    val nTouches = rows.map(_.getLong(1)).sum
    assert(math.abs(credit - attributed) <= nTouches * 5e-7 + 1e-9,
      s"credit $credit vs $attributed conversions")
  }

  test("q217: the cumulative column telescopes to the cohort total") {
    import graft.operators.Behavior
    val rows = Behavior.q217CohortLtv(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (cohort, cells) =>
      val ordered = cells.sortBy(_._2)
      var run = 0.0
      ordered.foreach { case (_, _, _, spend, cum) =>
        run += spend
        assert(math.abs(cum - run) < 1e-6, s"cohort $cohort")
      }
      assert(ordered.head._2 == 0, s"cohort $cohort starts at age 0")
    }
  }

  test("q218: lag-0 correlation is symmetric and bounded") {
    import graft.operators.Behavior
    val rows = Behavior.q218LagCorrelation(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)),
        (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((ta, tb, lag), (n, r)) =>
      assert(n > 0, s"$ta/$tb/$lag")
      r.foreach(v => assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12, s"$ta/$tb/$lag"))
    }
    rows.keys.filter(_._3 == 0).foreach { case k @ (ta, tb, _) =>
      assert(rows(k)._2 == rows((tb, ta, 0))._2, s"lag-0 r($ta,$tb) symmetric")
    }
  }

  test("q219: shards partition the corpus and digests are re-derivable") {
    import graft.operators.Layout
    val rows = Layout.q219ShardManifest(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._2).sum == docs.length)
    assert(rows.forall(r => r._1 >= 0 && r._1 < Layout.NumShards))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shardOf(text: String): Int = {
      val h = md5hex(text)
      (h(0).toInt * 31 + h(1).toInt) % Layout.NumShards
    }
    val expect = docs.groupBy(d => shardOf(d._2))
    rows.foreach { case (shard, nDocs, totalChars, idsMd5) =>
      val ds = expect(shard)
      assert(nDocs == ds.length, s"shard $shard")
      assert(totalChars == ds.map(_._3).sum, s"shard $shard")
      val digest = md5hex(ds.map(_._1.toString).sorted.mkString(","))
      assert(idsMd5 == digest, s"shard $shard digest")
    }
  }

  test("q220: maintained join view is indistinguishable from recomputation") {
    import graft.operators.MaintOps
    val maintained = MaintOps.q220JoinIvm(spark, sf).collect()
    // recompute the target snapshot directly: all orders x new dim version
    val c = Tables.customer(spark, sf)
    val cNew = c.withColumn("c_acctbal",
      when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(MaintOps.IvmBalBump))
        .otherwise(col("c_acctbal")))
    val target = Tables.orders(spark, sf)
      .join(cNew, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.Det.dsum(col("o_totalprice")).as("revenue"),
        graft.operators.Det.dsum(col("c_acctbal")).as("bal_mass"))
      .orderBy(col("c_nationkey")).collect()
    assert(maintained.map(_.toString).sameElements(target.map(_.toString)))
    // the split is non-trivial: both the state and the delta sides are populated
    val nDelta = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit(MaintOps.JoinIvmCutoff)).count()
    assert(nDelta > 0 && nDelta < Tables.orders(spark, sf).count())
  }

  test("q222: TWAP matches a driver-side segment recompute") {
    import graft.operators.EventTime
    val got = EventTime.q222Twap(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    ev.groupBy(_._1).foreach { case (uid, xs) =>
      val ordered = xs.sortBy(e => (e._3, e._2))
      val segs = ordered.zip(ordered.tail).map { case (a, b) =>
        val vm = math.floor(a._4 * 1e6 + 0.5).toLong
        val dtS = (b._3 - a._3) / 1000000
        (vm, dtS)
      }
      val span = segs.map(_._2).sum
      if (span > 0) {
        val wsum = segs.map(s => s._1 * s._2).sum
        val twap = wsum.toDouble / span.toDouble / 1e6
        val (n, gotSpan, gotTwap) = got(uid)
        assert(n == segs.length && gotSpan == span && gotTwap == twap, s"user $uid")
      } else assert(!got.contains(uid), s"zero-span user $uid must be excluded")
    }
  }

  test("q223: bins partition the orders; IV terms are consistent with WOE") {
    import graft.operators.FeatureOps
    val rows = FeatureOps.q223WoeIv(spark, sf).collect()
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == n)
    assert(rows.map(_.getInt(0)).distinct.length == rows.length)
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        val (ng, nb, woe, iv) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
        assert(ng > 0 && nb > 0)
        // iv term carries woe's sign times the probability gap's sign
        assert(iv == iv) // not NaN
        assert(math.abs(woe) < 10.0, "6-dp-rounded log odds in a sane range")
      } else assert(r.getDouble(4) == 0.0, "one-sided bins contribute zero IV")
    }
  }

  test("q207: CMS estimate is never below the exact count") {
    val rows = ScaleOps2.q207CountMin(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (cnt, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= cnt, s"CMS under-counted ${r.getString(0)}")
      assert(over == est - cnt)
    }
    // the top-10 exact counts agree with a direct groupBy
    val direct = Tables.documents(spark, sf)
      .select(explode(graft.functions.Portable.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(r => (r.getString(0), r.getLong(1))).sameElements(direct))
  }
}
