package graft

import graft.operators.{GovernanceOps, Round13Ops, Round14Ops}
import org.scalatest.funsuite.AnyFunSuite

class Round14OpsSpec extends AnyFunSuite {
  import TestSpark._

  /** Independent plain-Scala inverse CDF of the α = 1/2 tier — shared
    * with Round13OpsSpec's reference (duplicated on purpose: each spec
    * stays self-contained). */
  private def noiseRef(u: Long): Long = {
    val half = 1L << 19
    def l2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    if (u < half) { if (u == 0) -20 else -(19 - l2(u)) }
    else if (u < 2L * half) 0
    else { val v = Round13Ops.DpD - 1 - u; if (v == 0) 20 else 19 - l2(v) }
  }

  /** Independent plain-Scala inverse CDF of the NEW α = 1/4 tier the
    * SQL fragment [[Round14Ops.dpNoise4Sql]] must realize. */
  private def noiseRef4(u: Long): Long = {
    val neg = 1L << 18
    def l4(x: Long): Long = (63 - java.lang.Long.numberOfLeadingZeros(x)) / 2
    if (u < neg) { if (u == 0) -10 else -(9 - l4(u)) }
    else if (u < (1L << 20)) 0
    else { val v = Round14Ops.DpD4 - 1 - u; if (v == 0) 10 else 9 - l4(v) }
  }

  /** The α = 1/2 tier's full histogram, enumerated once (q329's tail
    * reference re-derives from it). */
  private lazy val hist2: Map[Long, Long] = {
    val h = new scala.collection.mutable.HashMap[Long, Long]().withDefaultValue(0L)
    var u = 0L
    while (u < Round13Ops.DpD) { h(noiseRef(u)) += 1; u += 1 }
    h.toMap.withDefaultValue(0L)
  }

  test("alpha=1/4 mechanism: the realized distribution is EXACTLY dyadic base 4, eps = 2 ln 2") {
    // enumerate every one of the D4 = 5·2^18 uniforms: the histogram must
    // be P(0)·D4 = 3·4^9, P(±k)·D4 = 3·4^(9−k) for 1 ≤ k ≤ 9, P(±10)·D4
    // = 1 (collapsed tails) — no approximation anywhere
    val hist = new scala.collection.mutable.HashMap[Long, Long]().withDefaultValue(0L)
    var u = 0L
    while (u < Round14Ops.DpD4) { hist(noiseRef4(u)) += 1; u += 1 }
    assert(hist(0L) == 3L << 18)
    (1 to 9).foreach { k =>
      assert(hist(k.toLong) == 3L << (2 * (9 - k)), s"P(+$k)")
      assert(hist(-k.toLong) == 3L << (2 * (9 - k)), s"P(-$k)")
    }
    assert(hist(10L) == 1 && hist(-10L) == 1)
    assert(hist.keys.forall(k => k >= -10 && k <= 10), "support bounded")
    assert(hist.values.sum == Round14Ops.DpD4)
    // realized ε: every interior adjacent-outcome ratio is exactly 4 →
    // ε = ln 4 = 2·ln 2; the collapsed tail's ratio is 3 < 4 (never the
    // binding one); truncation beyond ±10 is the δ = 2/D4
    val maxRatio = (-9 to 8).map { k =>
      val (a, b) = (hist(k.toLong).toDouble, hist(k + 1L).toDouble)
      math.max(a / b, b / a)
    }.max
    assert(maxRatio == 4.0, s"realized worst interior ratio $maxRatio")
    assert(hist(9L).toDouble / hist(10L) == 3.0, "collapsed-tail ratio")
    assert(Round14Ops.DpEps4Micro == 2 * Round13Ops.DpEpsCellMicro)
    assert(Round14Ops.DpEps4Micro == math.round(math.log(4) * 1e6))
    // the cross-tier δ ledger constants are what they claim
    assert(Round14Ops.DpDeltaLcm % Round13Ops.DpD == 0)
    assert(Round14Ops.DpDeltaLcm % Round14Ops.DpD4 == 0)
    assert(Round14Ops.Dp328DeltaNum ==
      2 * (Round14Ops.DpDeltaLcm / Round13Ops.DpD) +
        2 * (Round14Ops.DpDeltaLcm / Round14Ops.DpD4))
  }

  test("alpha=1/4 mechanism: the shared SQL fragment equals the Scala reference on Spark") {
    import org.apache.spark.sql.functions._
    val d4 = Round14Ops.DpD4
    // a sweep across [0, D4) plus every base-4 CDF boundary's neighborhood
    val boundary = (0 to 10).flatMap(k =>
      Seq(1L << (2 * k), (1L << (2 * k)) - 1, d4 - (1L << (2 * k)),
        d4 - 1 - (1L << (2 * k)))) ++
      Seq(0L, d4 - 1, 1L << 18, (1L << 20) - 1, 1L << 20)
    val us = ((0L until d4 by 991L) ++ boundary)
      .filter(u => u >= 0 && u < d4).distinct
    val got = spark.createDataFrame(us.map(Tuple1(_))).toDF("u")
      .withColumn("noise", expr(Round14Ops.dpNoise4Sql("u")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    us.foreach(u => assert(got(u) == noiseRef4(u), s"u=$u"))
  }

  test("q328: each level noised by ITS tier, ledger split sums to the total") {
    val rows = Round14Ops.q328DpBudgetSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    val eps1 = Round13Ops.DpEpsCellMicro
    val eps2 = Round14Ops.DpEps4Micro
    rows.foreach { r =>
      val level = r.getAs[Long]("level")
      val u = r.getAs[Long]("u")
      val noise = r.getAs[Long]("noise")
      if (level == 1) {
        assert(u >= 0 && u < Round13Ops.DpD)
        assert(noise == noiseRef(u), "level 1 must use the alpha=1/2 tier")
        assert(r.getAs[Long]("alpha_den") == 2)
        assert(r.getAs[Long]("noise_d") == Round13Ops.DpD)
        assert(r.getAs[Long]("eps_level_micro") == eps1)
      } else {
        assert(u >= 0 && u < Round14Ops.DpD4)
        assert(noise == noiseRef4(u), "level 2 must use the alpha=1/4 tier")
        assert(r.getAs[Long]("alpha_den") == 4)
        assert(r.getAs[Long]("noise_d") == Round14Ops.DpD4)
        assert(r.getAs[Long]("eps_level_micro") == eps2)
      }
      val nTrue = r.getAs[Long]("n_true")
      val supp = r.getAs[Boolean]("suppressed")
      assert(supp == (nTrue < GovernanceOps.KAnonK))
      if (supp) assert(r.isNullAt(r.fieldIndex("n_released")))
      else assert(r.getAs[Long]("n_released") == math.max(0L, nTrue + noise))
      // the BUDGET property: the release total is the per-level SUM
      assert(r.getAs[Long]("eps_release_micro") == eps1 + eps2)
      assert(r.getAs[Long]("delta_level_num") == Round13Ops.DpDeltaNum)
      assert(r.getAs[Long]("delta_level_den") == r.getAs[Long]("noise_d"))
      assert(r.getAs[Long]("delta_release_num") == Round14Ops.Dp328DeltaNum)
      assert(r.getAs[Long]("delta_release_den") == Round14Ops.DpDeltaLcm)
    }
    // level 2 is the exact marginal of level 1 (same identity as q321)
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
    // the coarse level's tighter noise is observable: |noise| ≤ 10 there
    assert(lvl2.forall(r => math.abs(r.getAs[Long]("noise")) <= 10))
  }

  test("q329: release probabilities are the mechanism's EXACT tails; the gate reads only noisy values") {
    // the closed-form tail must BE the enumerated histogram's tail,
    // for every gap the formula distinguishes
    def tailFormula(t: Long): Long =
      if (t >= 21) 0L
      else if (t >= 1) 1L << (20 - t).toInt
      else if (t >= -19) Round13Ops.DpD - (1L << (19 + t).toInt)
      else Round13Ops.DpD
    (-25L to 25L).foreach { t =>
      val enumerated = (math.max(t, -20L) to 20L).map(hist2).sum
      assert(tailFormula(t) == enumerated, s"tail at t=$t")
    }
    val rows = Round14Ops.q329DpNoisyGate(spark, sf).collect()
    assert(rows.nonEmpty)
    // the surface is the (lang, source) marginal — recount it
    val marg = Tables.documents(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("source"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("count")).toMap
    assert(rows.length == marg.size)
    val tau = Round14Ops.DpGateTau
    rows.foreach { r =>
      val nTrue = r.getAs[Long]("n_true")
      assert(nTrue ==
        marg((r.getAs[String]("lang"), r.getAs[String]("source"))))
      val noise = r.getAs[Long]("noise")
      assert(noise == noiseRef(r.getAs[Long]("u")))
      val noisy = r.getAs[Long]("noisy_count")
      assert(noisy == nTrue + noise)
      // the gate decision is a pure function of the NOISY value — the
      // private-suppression contract (q321 gates on nTrue instead)
      assert(r.getAs[Boolean]("released") == (noisy >= tau))
      assert(r.getAs[Boolean]("true_gate") == (nTrue >= GovernanceOps.KAnonK))
      assert(r.getAs[Boolean]("gate_agree") ==
        (r.getAs[Boolean]("released") == r.getAs[Boolean]("true_gate")))
      if (r.getAs[Boolean]("released"))
        assert(r.getAs[Long]("n_released") == math.max(0L, noisy))
      else assert(r.isNullAt(r.fieldIndex("n_released")))
      assert(r.getAs[Long]("p_release_num") == tailFormula(tau - nTrue))
      assert(r.getAs[Long]("p_release_den") == Round13Ops.DpD)
      // gating on an already-noised value is post-processing: the ledger
      // carries ONLY the truncation δ, no threshold term
      assert(r.getAs[Long]("eps_release_micro") == Round13Ops.DpEpsCellMicro)
      assert(r.getAs[Long]("delta_release_num") == Round13Ops.DpDeltaNum)
      assert(r.getAs[Long]("p_count1_release_num") == tailFormula(tau - 1))
    }
    // the fixture must exercise both gate outcomes AND a disagreement
    // (the utility price the op exists to measure)
    assert(rows.exists(_.getAs[Boolean]("released")))
    assert(rows.exists(!_.getAs[Boolean]("released")))
    assert(rows.exists(!_.getAs[Boolean]("gate_agree")))
    val disagree = rows.count(!_.getAs[Boolean]("gate_agree")).toLong
    assert(rows.forall(_.getAs[Long]("n_gate_disagree") == disagree))
  }

  test("q330: every domain recounts from raw tables; maintained == scratch everywhere") {
    import org.apache.spark.sql.functions._
    import graft.functions.Portable.{polyHash, tokens}
    val mod = Round14Ops.DelMod
    // base facts via the same engine expressions (hash + tokenizer), all
    // GROUPING and DELETION logic recounted in plain Scala
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        polyHash(array_join(slice(tokens(lower(col("text"))), 1, 2), " "))
          .as("fp"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getString(1), r.getString(2),
        r.getAs[Long]("n_tok") / GovernanceOps.KAnonLenBucket, r.getAs[Long]("fp")))
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id")).collect()
      .map(_.getLong(0))
    val asg = graft.ml.HybridIndex.assigned(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getInt(1).toLong)
    def del(id: Long): Boolean = id % mod == 0
    val rows = Round14Ops.q330DeletionPropagation(spark, sf).collect()
    // THE contract: the maintained path equals the scratch recount on
    // every row of every domain
    rows.foreach { r =>
      assert(r.getAs[Boolean]("consistent"),
        s"${r.getAs[String]("domain")}/${r.getAs[Long]("key")}: maintained != scratch")
      assert(r.getAs[Long]("n_after") == r.getAs[Long]("n_after_scratch"))
      assert(r.getAs[Boolean]("invalidated") == (r.getAs[Long]("n_deleted") > 0))
    }
    def domain(name: String) = rows.filter(_.getAs[String]("domain") == name)
      .map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_deleted"))).toMap
    // release cells (keyed by the engine hash of the quasi tuple — the
    // spec recounts sizes per (lang, source, len_b) group)
    val cellExp = base.groupBy(t => (t._2, t._3, t._4)).values.map { g =>
      (g.length.toLong, g.count(t => del(t._1)).toLong)
    }.toSeq.sorted
    assert(domain("release_cell").values.toSeq.sorted == cellExp)
    // dup blocks: 2-token prefix groups of >= 2, keyed by the prefix fp
    val dupExp = base.groupBy(_._5).filter(_._2.length >= 2).map { case (fp, g) =>
      fp -> (g.length.toLong, g.count(t => del(t._1)).toLong)
    }
    assert(domain("dup_cluster") == dupExp)
    // IVF cells: the persisted trained assignment, maintained removal
    val ivfExp = asg.groupBy(_._2).map { case (c, g) =>
      c -> (g.length.toLong, g.count(t => del(t._1)).toLong)
    }
    assert(domain("ivf_cell") == ivfExp)
    // artifact verdicts: invalidated iff any source-table row is deleted
    val dd = base.count(t => del(t._1)).toLong
    val dv = vecs.count(del).toLong
    val nd = base.length.toLong
    val nv = vecs.length.toLong
    assert(domain("artifact:hybrid")(0L) == (nd + nv, dd + dv))
    assert(domain("artifact:grams")(0L) == (nd, dd))
    assert(domain("artifact:knn38")(0L) == (nv, dv))
    assert(domain("artifact:knn247")(0L) == (nv, dv))
    // the deletion list must be non-trivial at the fixture (some deleted,
    // some kept, at least one dup cluster and one IVF cell touched)
    assert(dd > 0 && dd < nd && dv > 0 && dv < nv)
    assert(domain("dup_cluster").values.exists(_._2 > 0))
    assert(domain("ivf_cell").values.exists(_._2 > 0))
  }

  test("q330's artifact verdict is REAL: deleting rows changes the fingerprint and the store rebuilds") {
    import org.apache.spark.sql.functions._
    // scratch corpus = the fixture's documents + embeddings, copied
    val dir = java.nio.file.Files.createTempDirectory("r14del").resolve("corpus")
    java.nio.file.Files.createDirectories(dir)
    Seq("documents", "embeddings").foreach { t =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/$t.parquet"),
        dir.resolve(s"$t.parquet"))
    }
    val d = dir.toString
    try {
      var builds = 0
      def ensure() = ml.ArtifactStore.ensure(spark, d, "spec14del",
        Seq("documents", "embeddings")) { out =>
        builds += 1
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out)): Unit
      }
      val (_, b1) = ensure()
      assert(b1 && builds == 1, "first ensure builds")
      val (_, b2) = ensure()
      assert(!b2 && builds == 1, "unchanged corpus serves the artifact")
      // apply q330's deletion predicate IN PLACE (tombstone-filtered
      // rewrite of the documents table — what an erasure job does)
      val kept = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("doc_id") % Round14Ops.DelMod =!= 0)
        .collect()
      val schema = spark.read.parquet(s"$d/documents.parquet").schema
      java.nio.file.Files.delete(dir.resolve("documents.parquet"))
      spark.createDataFrame(
          java.util.Arrays.asList(kept: _*), schema)
        .coalesce(1).write.parquet(s"$d/documents.parquet")
      // the verdict q330 emits for 'artifact:*' is exactly this: the
      // content fingerprint changed, so the next ensure REBUILDS
      val (_, b3) = ensure()
      assert(b3 && builds == 2,
        "deletion must invalidate the artifact (fingerprint change -> rebuild)")
    } finally ml.ArtifactStore.dropForCorpus(d)
  }

  test("q331: rows match a plain-Scala adaptive probe over the TRAINED persisted index") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      r6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    // the trained persisted model — the SAME artifact the query reads
    val cents = graft.ml.HybridIndex.centroids(spark, sf).collect()
      .map(r => r.getInt(0).toLong -> r.getSeq[Double](1)).sortBy(_._1)
    val cell = graft.ml.HybridIndex.assigned(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getInt(1).toLong).toMap
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).sortBy(_._1)
    val queries = emb.filter(_._1 < 8)
    def dsq(q: Seq[Float], c: Seq[Double]): Double =
      q.zip(c).foldLeft(0.0) { case (acc, (x, y)) =>
        val dx = x.toDouble - y; acc + dx * dx
      }
    val occ = cell.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = queries.map { case (qid, qe) =>
      qid -> emb.filter(_._1 != qid)
        .map { case (cid, ce) => (-cos(qe, ce), cid) }.sorted.take(5).map(_._2).toSet
    }.toMap
    val expected = queries.map { case (qid, qe) =>
      val order = cents.map { case (k, c) => (dsq(qe, c), k) }.sorted.map(_._2)
      val cums = order.scanLeft(0L)((acc, k) => acc + occ.getOrElse(k, 0L)).tail
      val depth = cums.indexWhere(_ >= Round13Ops.AdaptBudget) match {
        case -1 => order.length
        case i => i + 1
      }
      val probed = order.take(depth).toSet
      val cand = emb.filter { case (cid, _) => cid != qid && probed(cell(cid)) }
      val top = cand.map { case (cid, ce) => (-cos(qe, ce), cid) }.sorted
        .take(5).map(_._2)
      val nHit = top.count(truth(qid)).toLong
      (qid, depth.toLong, cand.length.toLong, nHit, nHit * 200000L)
    }
    val got = Round14Ops.q331MultiProbeTrained(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("probe_depth"),
        r.getAs[Long]("n_cand"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("recall_micro")))
    assert(got.toSeq == expected.toSeq)
    // serving properties: the budget binds (no full-corpus scan) and the
    // trained cells are uneven enough that depths differ across queries
    assert(got.forall(_._3 < emb.length - 1))
    assert(got.map(_._2).distinct.length > 1 || got.exists(_._2 > 1))
  }

  test("q333: portfolio n_cells are LIVE (equal to each release's actual output) and totals compose") {
    val rows = Round14Ops.q333DpPortfolio(spark, sf).collect()
    val docs = rows.filter(_.getAs[String]("dataset") == "documents")
      .sortBy(_.getAs[Long]("ord"))
    val events = rows.filter(_.getAs[String]("dataset") == "events")
    assert(docs.length == 10 && events.length == 1)
    def cellsOf(name: String): Long =
      docs.find(_.getAs[String]("release") == name).get.getAs[Long]("n_cells")
    // every n_cells equals the release op's REAL output size — the
    // account reads the data, it does not transcribe constants
    assert(cellsOf("q321_dp_release") ==
      Round13Ops.q321DpRelease(spark, sf).count())
    assert(cellsOf("q323_dp_sum_release") ==
      Round13Ops.q323DpSumRelease(spark, sf).count())
    assert(cellsOf("q324_dp_vocab_release") ==
      Round13Ops.q324DpVocabRelease(spark, sf).count())
    val q325 = Round13Ops.q325DpReconcile(spark, sf).collect()
    assert(cellsOf("q325_dp_reconcile") ==
      q325.length + q325.map(_.getAs[String]("lang")).distinct.length)
    assert(cellsOf("q328_dp_budget_split") ==
      Round14Ops.q328DpBudgetSplit(spark, sf).count())
    assert(cellsOf("q329_dp_noisy_gate") ==
      Round14Ops.q329DpNoisyGate(spark, sf).count())
    assert(cellsOf("q332_dp_rerelease") ==
      2 * Round14Ops.q332DpRerelease(spark, sf).count())
    assert(cellsOf("q334_dp_noisy_max") ==
      Round14Ops.q334DpNoisyMax(spark, sf).count())
    // rows 9/10 (the round-15 releases) are pinned in depth by
    // Round15OpsSpec; here the count discipline: distinct released cells
    assert(cellsOf("q335_dp_continual") ==
      graft.operators.Round15Ops.q335ContinualCounter(spark, sf)
        .select(org.apache.spark.sql.functions.col("lang"),
          org.apache.spark.sql.functions.col("level"),
          org.apache.spark.sql.functions.col("idx")).distinct().count())
    assert(cellsOf("q336_dp_quantile") ==
      graft.operators.Round15Ops.q336DpQuantile(spark, sf)
        .filter(org.apache.spark.sql.functions.col("is_selected")).count())
    assert(events.head.getAs[Long]("n_cells") ==
      Round13Ops.q327DpUserLevel(spark, sf).count())
    // sequential composition: cum is the prefix sum, total the full sum
    val eps = docs.map(_.getAs[Long]("eps_micro"))
    val cums = docs.map(_.getAs[Long]("cum_eps_micro"))
    assert(cums.toSeq == eps.scanLeft(0L)(_ + _).tail.toSeq)
    assert(docs.forall(_.getAs[Long]("total_eps_micro") == eps.sum))
    // the documents portfolio costs 22·ln 2 (2+1+1+2+3+1+2+2+4+4 ln-2 units)
    assert(eps.sum == 22 * Round13Ops.DpEpsCellMicro)
    // δ normalization to lcm(D, D4) is exact, totals add as integers
    docs.foreach { r =>
      assert(r.getAs[Long]("delta_num_lcm") == r.getAs[Long]("delta_num") *
        (Round14Ops.DpDeltaLcm / r.getAs[Long]("delta_den")))
    }
    assert(docs.forall(_.getAs[Long]("total_delta_num") ==
      docs.map(_.getAs[Long]("delta_num_lcm")).sum))
    // the events account is user-level: ε scales with |cells| (q327's rule)
    assert(events.head.getAs[Long]("eps_micro") ==
      events.head.getAs[Long]("n_cells") * Round13Ops.DpEpsCellMicro)
  }

  test("q334: the noisy argmax recounts; selection is one-shot priced") {
    val rows = Round14Ops.q334DpNoisyMax(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("noise") == noiseRef(r.getAs[Long]("u")))
      assert(r.getAs[Long]("noisy_count") ==
        r.getAs[Long]("n_true") + r.getAs[Long]("noise"))
    }
    // the winner is the exact argmax under (noisy desc, lang, source)
    val want = rows.map(r => (-r.getAs[Long]("noisy_count"),
      r.getAs[String]("lang"), r.getAs[String]("source"))).min
    val winners = rows.filter(_.getAs[Boolean]("is_winner"))
    assert(winners.length == 1)
    val w = winners.head
    assert((-w.getAs[Long]("noisy_count"), w.getAs[String]("lang"),
      w.getAs[String]("source")) == want)
    assert(rows.forall(r => r.getAs[String]("winner_lang") == w.getAs[String]("lang") &&
      r.getAs[String]("winner_source") == w.getAs[String]("source")))
    // gaps are against the winner's noisy count; the runner-up gap is
    // the smallest loser gap (the utility readout)
    rows.foreach(r => assert(r.getAs[Long]("gap_to_winner") ==
      w.getAs[Long]("noisy_count") - r.getAs[Long]("noisy_count")))
    val bestLoser = rows.filter(!_.getAs[Boolean]("is_winner"))
      .map(_.getAs[Long]("gap_to_winner")).min
    assert(rows.forall(_.getAs[Long]("runner_up_gap") == bestLoser))
    // the selection price is CONSTANT in |cells| — the op's whole point
    val n = rows.length.toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cells") == n)
      assert(r.getAs[Long]("eps_selection_micro") == 2 * Round13Ops.DpEpsCellMicro)
      assert(r.getAs[Long]("eps_monotone_micro") == Round13Ops.DpEpsCellMicro)
      // ...while the truncation δ union-bounds over cells, so it is NOT
      assert(r.getAs[Long]("delta_selection_num") == n * Round13Ops.DpDeltaNum)
    }
    // the noisy winner differs from the TRUE modal cell or not — either
    // way the true argmax must be a close contender: sanity that noise
    // support (±20) bounds how far the winner's true count can sit from
    // the true maximum
    val trueMax = rows.map(_.getAs[Long]("n_true")).max
    assert(trueMax - w.getAs[Long]("n_true") <= 40)
  }

  test("q332: both releases recount; the rotated salt draws independent noise") {
    import org.apache.spark.sql.functions._
    import graft.functions.Portable.tokens
    val mod = Round14Ops.DelMod
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getString(1), r.getString(2),
        r.getAs[Long]("n_tok") / GovernanceOps.KAnonLenBucket))
    val v1 = docs.groupBy(t => (t._2, t._3, t._4)).view.mapValues(_.length.toLong).toMap
    val v2 = docs.filter(_._1 % mod != 0)
      .groupBy(t => (t._2, t._3, t._4)).view.mapValues(_.length.toLong).toMap
    val rows = Round14Ops.q332DpRerelease(spark, sf).collect()
    assert(rows.length == v1.size)
    rows.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("len_b"))
      val (n1, n2) = (v1(key), v2.getOrElse(key, 0L))
      assert(r.getAs[Long]("n_true_v1") == n1)
      assert(r.getAs[Long]("n_true_v2") == n2)
      assert(r.getAs[Long]("n_deleted") == n1 - n2)
      Seq(("v1", n1), ("v2", n2)).foreach { case (sfx, n) =>
        val noise = r.getAs[Long](s"noise_$sfx")
        assert(noise == noiseRef(r.getAs[Long](s"u_$sfx")))
        val supp = r.getAs[Boolean](s"suppressed_$sfx")
        assert(supp == (n < GovernanceOps.KAnonK))
        if (supp) assert(r.isNullAt(r.fieldIndex(s"n_released_$sfx")))
        else assert(r.getAs[Long](s"n_released_$sfx") == math.max(0L, n + noise))
      }
      // the pair prices as sequential composition — erasure is not free
      assert(r.getAs[Long]("eps_total_micro") == 2 * Round13Ops.DpEpsCellMicro)
      assert(r.getAs[Long]("delta_total_num") == 2 * Round13Ops.DpDeltaNum)
    }
    // the rotation is real: the two draws differ somewhere even on cells
    // with IDENTICAL counts (same cell tag, different salt tag) — under
    // the SAME salt the unchanged cells' noise would cancel exactly,
    // which is the differencing attack the op documents
    val unchanged = rows.filter(r => r.getAs[Long]("n_deleted") == 0)
    assert(unchanged.nonEmpty)
    assert(unchanged.exists(r =>
      r.getAs[Long]("noise_v1") != r.getAs[Long]("noise_v2")))
    // deletion must actually change some cells at the fixture
    assert(rows.exists(_.getAs[Long]("n_deleted") > 0))
    val changed = rows.count(_.getAs[Long]("n_deleted") > 0).toLong
    assert(rows.forall(_.getAs[Long]("n_cells_changed") == changed))
  }
}
