package graft

import graft.operators.{AnnAudit, GovernanceOps, Round13Ops}
import org.scalatest.funsuite.AnyFunSuite

class Round13OpsSpec extends AnyFunSuite {
  import TestSpark._

  /** Independent plain-Scala inverse CDF of the two-sided geometric
    * (α = 1/2) on u ∈ [0, D) — the reference [[Round13Ops.dpNoiseSql]]
    * must realize. */
  private def noiseRef(u: Long): Long = {
    val half = 1L << 19
    def l2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    if (u < half) { if (u == 0) -20 else -(19 - l2(u)) }
    else if (u < 2L * half) 0
    else { val v = Round13Ops.DpD - 1 - u; if (v == 0) 20 else 19 - l2(v) }
  }

  test("q321 mechanism: the realized noise distribution is EXACTLY dyadic, eps = ln 2") {
    // enumerate every one of the D = 3·2^19 uniforms: the histogram must
    // be P(0)·D = 2^19, P(±k)·D = 2^(19-k) for 1 ≤ k ≤ 19, P(±20)·D = 1
    // (the collapsed tails) — no approximation anywhere
    val hist = new scala.collection.mutable.HashMap[Long, Long]().withDefaultValue(0L)
    var u = 0L
    while (u < Round13Ops.DpD) { hist(noiseRef(u)) += 1; u += 1 }
    assert(hist(0L) == (1L << 19))
    (1 to 19).foreach { k =>
      assert(hist(k.toLong) == (1L << (19 - k)), s"P(+$k)")
      assert(hist(-k.toLong) == (1L << (19 - k)), s"P(-$k)")
    }
    assert(hist(20L) == 1 && hist(-20L) == 1)
    assert(hist.keys.forall(k => k >= -20 && k <= 20), "support bounded")
    assert(hist.values.sum == Round13Ops.DpD)
    // realized ε: the worst adjacent-outcome probability ratio over the
    // support interior is exactly 2 → ε = ln 2 (the truncation beyond
    // ±20 is the ledger's δ = 2/D, not an ε term)
    val maxRatio = (-19 to 18).map { k =>
      val (a, b) = (hist(k.toLong).toDouble, hist(k + 1L).toDouble)
      math.max(a / b, b / a)
    }.max
    assert(maxRatio == 2.0, s"realized worst ratio $maxRatio")
    assert(Round13Ops.DpEpsCellMicro == math.round(math.log(2) * 1e6))
    assert(Round13Ops.DpDeltaNum == 2 && Round13Ops.DpDeltaDen == Round13Ops.DpD)
  }

  test("q321 mechanism: the shared SQL fragment equals the Scala reference on Spark") {
    import org.apache.spark.sql.functions._
    // a sweep across [0, D) plus every CDF boundary's neighborhood
    val boundary = (0 to 20).flatMap(k =>
      Seq(1L << k, (1L << k) - 1, Round13Ops.DpD - (1L << k),
        Round13Ops.DpD - 1 - (1L << k))) ++
      Seq(0L, Round13Ops.DpD - 1, 1L << 19, (1L << 20) - 1, 1L << 20)
    val us = ((0L until Round13Ops.DpD by 991L) ++ boundary)
      .filter(u => u >= 0 && u < Round13Ops.DpD).distinct
    val got = spark.createDataFrame(us.map(Tuple1(_))).toDF("u")
      .withColumn("noise", expr(Round13Ops.dpNoiseSql("u")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    us.foreach(u => assert(got(u) == noiseRef(u), s"u=$u"))
  }

  test("q321: gate agreement, clamp/null rules, marginal sums, ledger arithmetic") {
    val rows = Round13Ops.q321DpRelease(spark, sf).collect()
    assert(rows.nonEmpty)
    val eps = Round13Ops.DpEpsCellMicro
    rows.foreach { r =>
      val nTrue = r.getAs[Long]("n_true")
      val supp = r.getAs[Boolean]("suppressed")
      assert(supp == (nTrue < GovernanceOps.KAnonK),
        "suppression must BE the q299 k-anonymity gate")
      val u = r.getAs[Long]("u")
      assert(u >= 0 && u < Round13Ops.DpD)
      assert(r.getAs[Long]("noise") == noiseRef(u))
      if (supp) assert(r.isNullAt(r.fieldIndex("n_released")))
      else assert(r.getAs[Long]("n_released") ==
        math.max(0L, nTrue + r.getAs[Long]("noise")))
      // ledger: parallel within level, sequential across levels
      assert(r.getAs[Long]("eps_cell_micro") == eps)
      assert(r.getAs[Long]("eps_level_micro") == eps)
      assert(r.getAs[Long]("eps_release_micro") == r.getAs[Long]("n_levels") * eps)
      assert(r.getAs[Long]("delta_release_num") ==
        r.getAs[Long]("n_levels") * Round13Ops.DpDeltaNum)
      assert(r.getAs[Long]("eps_sequential_bound_micro") ==
        r.getAs[Long]("n_cells_released") * eps)
    }
    val n = rows.length.toLong
    assert(rows.forall(_.getAs[Long]("n_cells") == n))
    assert(rows.head.getAs[Long]("n_levels") == 2)
    // the level-2 marginal is the exact re-aggregation of level 1
    val lvl1 = rows.filter(_.getAs[Long]("level") == 1)
      .groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
      .view.mapValues(_.map(_.getAs[Long]("n_true")).sum).toMap
    val lvl2 = rows.filter(_.getAs[Long]("level") == 2)
    assert(lvl2.nonEmpty)
    lvl2.foreach { r =>
      assert(r.getAs[Long]("len_b") == -1L)
      assert(r.getAs[Long]("n_true") ==
        lvl1((r.getAs[String]("lang"), r.getAs[String]("source"))))
    }
    // the graded fixture must exercise BOTH outcomes of the gate
    assert(rows.exists(_.getAs[Boolean]("suppressed")))
    assert(rows.exists(!_.getAs[Boolean]("suppressed")))
  }

  test("q323: clip, quantize, noise, clamp — every column recounts from raw docs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_chars")))
    val c = Round13Ops.DpClipChars
    val exp = docs.groupBy(t => (t._1, t._2)).view.mapValues { rows =>
      (rows.length.toLong, rows.count(_._3 > c).toLong,
        rows.map(t => math.min(t._3, c)).sum)
    }.toMap
    val rows = Round13Ops.q323DpSumRelease(spark, sf).collect()
    assert(rows.length == exp.size)
    rows.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"))
      val (nDocs, nClipped, sumClipped) = exp(key)
      assert(r.getAs[Long]("n_docs") == nDocs)
      assert(r.getAs[Long]("n_clipped") == nClipped)
      assert(r.getAs[Long]("sum_clipped") == sumClipped)
      assert(r.getAs[Long]("units") == sumClipped / c)
      assert(r.getAs[Long]("noise") == noiseRef(r.getAs[Long]("u")))
      val supp = r.getAs[Boolean]("suppressed")
      assert(supp == (nDocs < GovernanceOps.KAnonK))
      if (supp) assert(r.isNullAt(r.fieldIndex("released_sum")))
      else {
        val rel = r.getAs[Long]("released_sum")
        assert(rel == math.max(0L, sumClipped / c + r.getAs[Long]("noise")) * c)
        assert(rel % c == 0, "release is quantized to clip units")
      }
    }
    // the clip must actually bind somewhere (else the op demonstrates nothing)
    assert(rows.map(_.getAs[Long]("n_clipped")).sum > 0)
  }

  test("q324: the unknown-domain release's delta is the mechanism's EXACT tail") {
    import org.apache.spark.sql.functions._
    // recompute δ = P(1 + noise >= τ) by enumerating the mechanism —
    // the claimed constant must BE the realized dyadic tail
    var tail = 0L
    var u = 0L
    while (u < Round13Ops.DpD) {
      if (noiseRef(u) >= Round13Ops.DpVocabTau - 1) tail += 1
      u += 1
    }
    assert(tail == Round13Ops.DpVocabDeltaNum,
      s"claimed delta num ${Round13Ops.DpVocabDeltaNum}, realized $tail")
    assert(Round13Ops.DpVocabDeltaDen == Round13Ops.DpD)
    val rows = Round13Ops.q324DpVocabRelease(spark, sf).collect()
    assert(rows.nonEmpty)
    // cells partition the corpus (one first token per document) — the
    // parallel-composition claim is a checkable identity
    val nDocs = Tables.documents(spark, sf)
      .filter(size(graft.functions.Portable.tokens(col("text"))) > 0).count()
    assert(rows.map(_.getAs[Long]("n_true")).sum == nDocs)
    assert(rows.forall(_.getAs[Long]("n_docs") == nDocs))
    rows.foreach { r =>
      assert(r.getAs[Long]("noise") == noiseRef(r.getAs[Long]("u")))
      assert(r.getAs[Long]("noisy_count") ==
        r.getAs[Long]("n_true") + r.getAs[Long]("noise"))
      assert(r.getAs[Boolean]("released") ==
        (r.getAs[Long]("noisy_count") >= Round13Ops.DpVocabTau))
    }
    // the threshold must split the fixture (some released, some not)
    assert(rows.exists(_.getAs[Boolean]("released")))
    assert(rows.exists(!_.getAs[Boolean]("released")))
  }

  test("q325: reconciled children SUM EXACTLY to the reconciled parent, per lang") {
    val rows = Round13Ops.q325DpReconcile(spark, sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val xP = rs.map(_.getAs[Long]("x_p")).distinct
      assert(xP.length == 1)
      // the property the op exists for: the constraint holds EXACTLY
      assert(rs.map(_.getAs[Long]("x_c")).sum == xP.head,
        s"$lang: reconciled children do not sum to the reconciled parent")
      // the OLS parent estimate, floor-rounded
      val m = rs.length.toLong
      val yP = rs.head.getAs[Long]("y_p")
      val sC = rs.map(_.getAs[Long]("y_c")).sum
      assert(rs.head.getAs[Long]("m") == m)
      assert(rs.head.getAs[Long]("s_c") == sC)
      assert(xP.head == (m * yP + sC) / (m + 1))
      // per-child adjustments differ by at most 1 (controlled rounding)
      val adjs = rs.map(_.getAs[Long]("adj"))
      assert(adjs.max - adjs.min <= 1)
      assert(adjs.sum == xP.head - sC)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("y_c") ==
        math.max(0L, r.getAs[Long]("n_true_c") + noiseRef(r.getAs[Long]("u_c"))))
      // no suppressed child ever meets this op (geometry chosen for it)
      assert(r.getAs[Long]("n_true_c") >= GovernanceOps.KAnonK)
      assert(r.getAs[Long]("eps_release_micro") == 2 * Round13Ops.DpEpsCellMicro)
    }
    // reconciliation must actually move something at this fixture
    // (identical y and x everywhere would mean the test can't detect a
    // broken adjustment path)
    assert(rows.exists(r => r.getAs[Long]("adj") != 0L))
  }

  test("q322: rows match a plain-Scala adaptive multi-probe recount") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      r6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).sortBy(_._1)
    val cents = emb.filter(_._1 < 16)
    val corpus = emb.filter(_._1 >= 16)
    val queries = corpus.filter(_._1 < 24)
    // assignment: best cosine, tie -> smaller centroid id
    val cell = corpus.map { case (cid, ce) =>
      cid -> cents.map { case (k, c) => (-cos(ce, c), k) }.min._2
    }.toMap
    val occ = cell.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = queries.map { case (qid, qe) =>
      qid -> corpus.filter(_._1 != qid)
        .map { case (cid, ce) => (-cos(qe, ce), cid) }.sorted
        .take(AnnAudit.RecallK).map(_._2).toSet
    }.toMap
    val expected = queries.map { case (qid, qe) =>
      val order = cents.map { case (k, c) => (-cos(qe, c), k) }.sorted.map(_._2)
      val cums = order.scanLeft(0L)((acc, k) => acc + occ.getOrElse(k, 0L)).tail
      val depth = cums.indexWhere(_ >= Round13Ops.AdaptBudget) match {
        case -1 => order.length
        case i => i + 1
      }
      val probed = order.take(depth).toSet
      val cand = corpus.filter { case (cid, _) => cid != qid && probed(cell(cid)) }
      val top = cand.map { case (cid, ce) => (-cos(qe, ce), cid) }.sorted
        .take(AnnAudit.RecallK).map(_._2)
      val nHit = top.count(truth(qid))
      (qid, depth.toLong, cand.length.toLong, nHit.toLong,
        math.floor(nHit.toDouble / AnnAudit.RecallK * 1e6 + 0.5).toLong)
    }
    val got = Round13Ops.q322MultiProbe(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("probe_depth"),
        r.getAs[Long]("n_cand"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("recall_micro")))
    assert(got.toSeq == expected.toSeq)
    // the knob is real: the budget binds (nobody scans the whole corpus)
    // and at least one query needed more than one cell
    assert(got.forall(_._3 < corpus.length - 1))
    assert(got.exists(_._2 > 1))
  }

  test("q327: contribution bounding recounts from raw events; user-level ledger composes") {
    import org.apache.spark.sql.functions._
    val raw = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("c")))
    val cap = Round13Ops.DpUserCap
    val exp = raw.groupBy(_._1).view.mapValues { rows =>
      (rows.length.toLong, rows.count(_._2 > cap).toLong,
        rows.map(t => math.min(t._2, cap)).sum)
    }.toMap
    val rows = Round13Ops.q327DpUserLevel(spark, sf).collect()
    assert(rows.length == exp.size)
    val nCells = rows.length.toLong
    rows.foreach { r =>
      val (nUsers, atCap, capped) = exp(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_users") == nUsers)
      assert(r.getAs[Long]("n_users_at_cap") == atCap)
      assert(r.getAs[Long]("capped_total") == capped)
      assert(r.getAs[Long]("units") == capped / cap)
      assert(r.getAs[Long]("noise") == noiseRef(r.getAs[Long]("u")))
      assert(r.getAs[Long]("released_count") ==
        math.max(0L, capped / cap + r.getAs[Long]("noise")) * cap)
      // the ledger's point: user-level epsilon is the SEQUENTIAL
      // composition over every cell a user can touch, never the
      // record-level per-cell figure
      assert(r.getAs[Long]("eps_record_micro") == Round13Ops.DpEpsCellMicro)
      assert(r.getAs[Long]("eps_user_micro") == nCells * Round13Ops.DpEpsCellMicro)
      assert(r.getAs[Long]("delta_user_num") == nCells * Round13Ops.DpDeltaNum)
    }
    // the bound must actually bind (else the op demonstrates nothing)
    assert(rows.map(_.getAs[Long]("n_users_at_cap")).sum > 0)
  }

  test("q326: the budget curve is monotone and its folds recount per query") {
    val rows = Round13Ops.q326BudgetCurve(spark, sf).collect()
      .map(r => (r.getAs[Long]("budget"), r.getAs[Long]("n_queries"),
        r.getAs[Long]("mean_depth_micro"), r.getAs[Long]("max_depth"),
        r.getAs[Long]("mean_cand_micro"), r.getAs[Long]("mean_recall_micro"),
        r.getAs[Long]("min_recall_micro")))
    assert(rows.map(_._1).toSeq == Round13Ops.BudgetGrid.map(_.toLong))
    assert(rows.forall(_._2 == 8), "the fixed 8-query slice")
    // more budget can only probe deeper, scan more, and recall at least
    // as much (candidate sets are nested in the budget)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._3 <= hi._3, "mean depth monotone in budget")
      assert(lo._5 <= hi._5, "mean candidates monotone in budget")
      assert(lo._6 <= hi._6, "mean recall monotone in budget")
    }
    // the middle budget must match q322 (same AdaptBudget, same plan
    // semantics — the curve and the serving op cannot drift apart)
    val q322 = Round13Ops.q322MultiProbe(spark, sf).collect()
    val atAdapt = rows.find(_._1 == Round13Ops.AdaptBudget.toLong).get
    assert(atAdapt._3 ==
      q322.map(_.getAs[Long]("probe_depth")).sum * 1000000L / q322.length)
    assert(atAdapt._5 ==
      q322.map(_.getAs[Long]("n_cand")).sum * 1000000L / q322.length)
    assert(atAdapt._6 == q322.map(_.getAs[Long]("recall_micro")).sum / q322.length)
    assert(atAdapt._7 == q322.map(_.getAs[Long]("recall_micro")).min)
  }
}
