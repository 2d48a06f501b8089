package graft

import graft.operators.{Round8Ops, Round9Ops}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-9 data-selection operators beyond the DuckDB
  * hash check: q285's weight semantics and q286's Gumbel-key math are
  * re-derived independently here. */
class Round9OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q285: only raw (non-benchmark) docs are ranked, counts anchored per source") {
    val rows = Round9Ops.q285DsirWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      assert(docId % Round8Ops.LshBenchMod != 0,
        s"benchmark doc $docId must never receive an importance weight")
      assert(r.getAs[Long]("n_target_like") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("rnk") >= 1 && r.getAs[Long]("rnk") <= Round9Ops.DsirTopK)
    }
    // top-ranked weights are non-increasing within a source
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("w_micro"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q285: per-source doc counts equal the raw-slice docs that have tokens") {
    val out = Round9Ops.q285DsirWeights(spark, sf)
      .select(col("source"), col("n_docs")).distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(Round8Ops.LshBenchMod)) =!= 0)
      .filter(size(graft.functions.Portable.tokens(col("text"))) > 0)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == want, s"per-source counts drifted: $out vs $want")
  }

  test("q286: keys match an independent scala re-derivation, sample is top-k") {
    val rows = Round9Ops.q286GumbelTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    val P = graft.functions.Portable.P
    rows.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val nTok = r.getAs[Long]("n_tok")
      val u = ((((docId % P) + P) % P * Round9Ops.GumbelMix % P).toDouble + 0.5) / P.toDouble
      val key = math.floor((math.log(math.max(nTok, 1L).toDouble) -
        math.log(-math.log(u))) * 1e6 + 0.5).toLong
      assert(r.getAs[Long]("key_micro") == key,
        s"doc $docId: key ${r.getAs[Long]("key_micro")} != scala $key")
      assert(r.getAs[Long]("rnk") >= 1 && r.getAs[Long]("rnk") <= Round9Ops.GumbelK)
    }
    // every source appears with exactly min(GumbelK, n_docs) picks
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val n = rs.head.getAs[Long]("n_docs")
      assert(rs.length == math.min(Round9Ops.GumbelK.toLong, n))
    }
  }

  test("q287: epoch permutations decorrelate; epoch 0 overlaps itself fully") {
    val rows = Round9Ops.q287EpochOrder(spark, sf).collect()
    assert(rows.nonEmpty)
    // epoch 0's head trivially overlaps itself: the built-in anchor
    rows.filter(_.getAs[Long]("epoch") == 0L).foreach { r =>
      val expect = math.min(Round9Ops.GumbelK.toLong, r.getAs[Long]("n_in_shard"))
      assert(r.getAs[Long]("n_head_overlap_e0") == expect)
    }
    // later epochs: an independent permutation of an n-doc shard shares
    // ~K*K/n head docs with epoch 0 — with n >> K the overlap must stay
    // far below a full-head match (a duplicated mix would give exactly K)
    rows.filter(_.getAs[Long]("epoch") > 0L).foreach { r =>
      assert(r.getAs[Long]("n_head_overlap_e0") < Round9Ops.GumbelK,
        s"epoch ${r.getAs[Long]("epoch")} shard ${r.getAs[Long]("shard")} " +
          "head identical to epoch 0 — permutation mixes not independent")
    }
    // the order is a permutation: per (epoch, shard) the head positions
    // are 1..OrderHeadK exactly once
    rows.groupBy(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard")))
      .foreach { case (_, rs) =>
        assert(rs.map(_.getAs[Long]("pos")).sorted.toSeq ==
          (1L to math.min(Round9Ops.OrderHeadK, rs.length).toLong))
      }
  }

  test("q288: every pair is a genuine preference from one user-day") {
    val rows = Round9Ops.q288PreferencePairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("margin_micro") > 0)
      assert(r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id"))
      assert(r.getAs[Long]("n_events") >= 2)
    }
    // margins are non-increasing in rank
    val margins = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("margin_micro"))
    assert(margins.zip(margins.tail).forall { case (a, b) => a >= b })
  }

  test("q289: rerank pool is Hamming-consistent and recall grades against q38") {
    val rows = Round9Ops.q289HammingRerank(spark, sf).collect()
    assert(rows.nonEmpty)
    // the packed-sign Hamming distance is re-derived in plain Scala from
    // the raw embeddings for every reported (qid, cid) pair
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    def sig(v: Seq[Float]): (Long, Long) = {
      def pack(off: Int) = (0 until 32).foldLeft(0L)((acc, i) =>
        if (v(off + i) >= 0f) acc | (1L << i) else acc)
      (pack(0), pack(32))
    }
    rows.foreach { r =>
      val (q0, q1) = sig(vecs(r.getAs[Long]("qid")))
      val (c0, c1) = sig(vecs(r.getAs[Long]("cid")))
      val ham = java.lang.Long.bitCount(q0 ^ c0) + java.lang.Long.bitCount(q1 ^ c1)
      assert(r.getAs[Long]("ham") == ham.toLong,
        s"(${r.getAs[Long]("qid")}, ${r.getAs[Long]("cid")}): " +
          s"ham ${r.getAs[Long]("ham")} != scala $ham")
      assert(r.getAs[Long]("n_hits") <= Round9Ops.HamK)
      assert(r.getAs[Long]("recall_micro") == r.getAs[Long]("n_hits") * 200000L)
    }
    // every query reports exactly HamK reranked rows, cosine non-increasing
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      assert(rs.length == Round9Ops.HamK)
      val cs = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q290: reported spans are genuinely duplicated, maximal-merged text") {
    val rows = Round9Ops.q290DupSpans(spark, sf).collect()
    assert(rows.nonEmpty)
    // re-derive ground truth in plain Scala: positional k-gram strings,
    // global count >= 2, merge duplicated positions whose gram extents
    // overlap or touch (gap < k — the ADVICE-r9 fix; gap-2..k-1 grams
    // must fold into ONE span so covered tokens are counted once)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").filter(_.nonEmpty).toSeq).toMap
    val k = Round9Ops.SpanGram
    val grams = docs.toSeq.flatMap { case (id, ts) =>
      (0 to ts.length - k).map(i => (id, i, ts.slice(i, i + k).mkString(" ")))
    }
    val dupSet = grams.groupBy(_._3).filter(_._2.size >= Round9Ops.SpanMinCount).keySet
    val spansByDoc = grams.filter(g => dupSet(g._3)).groupBy(_._1).map { case (id, gs) =>
      val ps = gs.map(_._2).sorted
      val spans = ps.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p - e < k => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      id -> spans.map { case (s, e) => (s, e - s + k) }.toSet
    }
    // merged spans cover disjoint token ranges: the visible sources'
    // dup_tokens are each bounded by the Scala model's global mass
    val dupTokScala = spansByDoc.values.flatten.map(_._2.toLong).sum
    rows.foreach(r => assert(r.getAs[Long]("dup_tokens") <= dupTokScala))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val want = (r.getAs[Long]("start_pos").toInt, r.getAs[Long]("span_tokens").toInt)
      assert(spansByDoc.getOrElse(id, Set.empty).contains(want),
        s"doc $id: reported span $want not in scala ground truth")
    }
    // top list is ordered by span length
    val lens = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("span_tokens"))
    assert(lens.zip(lens.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getAs[Long]("dup_tokens") <= r.getAs[Long]("tot_tokens")))
  }

  test("q291: quotas are exact integer sqrts and the sample hits them") {
    val rows = Round9Ops.q291CoverageSample(spark, sf).collect()
    assert(rows.nonEmpty)
    def isqrt(n: Long): Long = { var q = math.sqrt(n.toDouble).toLong
      while ((q + 1) * (q + 1) <= n) q += 1; while (q * q > n) q -= 1; q }
    rows.foreach { r =>
      val n = r.getAs[Long]("n_in_cell")
      assert(r.getAs[Long]("quota") == isqrt(n), s"cell quota != isqrt($n)")
      assert(r.getAs[Long]("rnk") <= Round9Ops.CoverHeadK)
      assert(r.getAs[Long]("share_micro") == r.getAs[Long]("quota") * 1000000L / n)
    }
    // global accounting: kept total = sum of per-cell quotas over all cells
    val perCell = rows.map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("quota")).toMap
    val keptTot = rows.head.getAs[Long]("n_kept_tot")
    assert(keptTot == perCell.values.sum,
      s"n_kept_tot $keptTot != sum of visible cell quotas ${perCell.values.sum} " +
        "(every cell must surface at least one head row)")
    assert(keptTot < rows.head.getAs[Long]("n_tot"))
  }

  test("q291: isqrt correction is exact at perfect-square boundaries") {
    // the pure-scala model mirrors the query's floor(sqrt)+-1 correction;
    // drive it across every boundary that double rounding could break
    def corrected(n: Long): Long = {
      val q0 = math.floor(math.sqrt(n.toDouble)).toLong
      q0 + (if (q0 < Round9Ops.MaxIsqrt && (q0 + 1) * (q0 + 1) <= n) 1L else 0L) -
        (if (q0 * q0 > n) 1L else 0L)
    }
    (1L to 100000L).foreach { n =>
      val q = corrected(n)
      assert(q * q <= n && (q + 1) * (q + 1) > n, s"isqrt($n) broke: $q")
    }
    // large-domain spot checks around perfect squares (past 2^26, where
    // sqrt(q^2 - 1) can round UP to q), including the int64 ceiling where
    // the unguarded (q0+1)^2 probe would overflow (wrap in Spark, raise
    // in DuckDB); at the ceiling the (r+1)^2 half of the check is itself
    // the overflowing probe, so it is guarded the same way
    Seq(1L << 30, (1L << 30) + 1, Round9Ops.MaxIsqrt).foreach { q =>
      Seq(q * q - 1, q * q, math.min(q * q + 1, Long.MaxValue)).foreach { n =>
        val r = corrected(n)
        assert(r * r <= n && (r == Round9Ops.MaxIsqrt || (r + 1) * (r + 1) > n),
          s"isqrt($n) broke: $r")
      }
    }
    corrected(Long.MaxValue) // must not wrap or throw at the extreme input
  }

  test("q292: cascade accounting matches a plain-Scala re-derivation") {
    val rows = Round9Ops.q292FilterAttrition(spark, sf).collect()
    assert(rows.nonEmpty)
    // monotone cascade + standalone-vs-cumulative consistency per source
    rows.foreach { r =>
      val Seq(n0, s1, s2, s3, s4) = Seq("n0", "n_s1", "n_s2", "n_s3", "n_s4")
        .map(r.getAs[Long])
      assert(n0 >= s1 && s1 >= s2 && s2 >= s3 && s3 >= s4)
      assert(r.getAs[Long]("n_fail_len") == n0 - s1,
        "stage 1 marginal must equal its standalone kill count")
      assert(r.getAs[Long]("tok4") <= r.getAs[Long]("tok0"))
      assert(r.getAs[Long]("share_kept_micro") <= 1000000L)
    }
    // full re-derivation from raw text
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("lang"), r.getAs[String]("text").split(" ").filter(_.nonEmpty).toSeq))
    val staged = docs.map { case (id, src, lang, ts) =>
      val n = ts.length.toLong
      val modeC = if (ts.isEmpty) 0L else ts.groupBy(identity).values.map(_.size).max.toLong
      val s1 = n >= Round9Ops.AttrMinTok && n <= Round9Ops.AttrMaxTok
      val s2 = s1 && modeC * Round9Ops.AttrRepMult <= n
      val s3 = s2 && Round9Ops.AttrKeepLangs.contains(lang)
      (id, src, ts, n, s3)
    }
    val s4ids = staged.filter(_._5)
      .groupBy(t => t._3.take(Round9Ops.SpanGram).mkString(" "))
      .values.map(_.map(_._1).min).toSet
    val wantS4 = staged.filter(t => t._5 && s4ids(t._1))
      .groupBy(_._2).view.mapValues(g => (g.size.toLong, g.map(_._4).sum)).toMap
    rows.foreach { r =>
      val (wantN, wantTok) = wantS4.getOrElse(r.getAs[String]("source"), (0L, 0L))
      assert(r.getAs[Long]("n_s4") == wantN && r.getAs[Long]("tok4") == wantTok,
        s"source ${r.getAs[String]("source")}: survivors drifted from scala model")
    }
  }

  test("q293: each cell flags exactly ceil(5%) by descending rounded distance") {
    val rows = Round9Ops.q293EmbedOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cluster")).foreach { case (_, rs) =>
      val n = rs.head.getAs[Long]("n_in_cell")
      val nOut = rs.head.getAs[Long]("n_out")
      assert(nOut == (n * Round9Ops.OutPctMicro + 999999L) / 1000000L)
      assert(nOut >= 1, "ceil must flag at least the farthest member")
      assert(rs.length == math.min(nOut, n).toInt)
      val ds = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("dist6"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a >= b },
        "flagged distances must be non-increasing in rank")
    }
  }

  test("q294: statuses partition both versions and match the mask arithmetic") {
    val rows = Round9Ops.q294VersionDiff(spark, sf).collect()
    assert(rows.nonEmpty)
    // per-source identities
    rows.foreach { r =>
      assert(r.getAs[Long]("n_v1") ==
        r.getAs[Long]("n_removed") + r.getAs[Long]("n_changed") + r.getAs[Long]("n_same"))
      assert(r.getAs[Long]("n_v2") ==
        r.getAs[Long]("n_added") + r.getAs[Long]("n_changed") + r.getAs[Long]("n_same"))
    }
    // global counts re-derived from the masks alone (no text needed):
    // added = in v2, not v1; removed = in v1, not v2; changed = in both
    // with an ACTUAL text difference (truncation only bites > ChgTokens)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.Portable.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    def inV1(id: Long) = id % Round9Ops.DiffAddMod != 0
    def inV2(id: Long) = id % Round9Ops.DiffRemMod != 0
    val wantAdded = docs.count { case (id, _) => !inV1(id) && inV2(id) }
    val wantRemoved = docs.count { case (id, _) => inV1(id) && !inV2(id) }
    val wantChanged = docs.count { case (id, n) => inV1(id) && inV2(id) &&
      id % Round9Ops.DiffChgMod == 0 && n > Round9Ops.DiffChgTokens }
    assert(rows.map(_.getAs[Long]("n_added")).sum == wantAdded)
    assert(rows.map(_.getAs[Long]("n_removed")).sum == wantRemoved)
    assert(rows.map(_.getAs[Long]("n_changed")).sum == wantChanged,
      "changed must be exactly the truncation-mask docs longer than the cut")
  }

  test("q295: slope is the OLS fit of the top-rank log-log terms, and negative") {
    val rows = Round9Ops.q295ZipfSlope(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent scala OLS over re-derived (lang, token) counts
    val counts = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((lang, tok), c) => (lang, tok, c) }
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val top = counts.filter(_._1 == lang)
        .sortBy(t => (-t._3, t._2)).take(Round9Ops.ZipfRanks)
      def lnm(v: Long) = math.floor(math.log(v.toDouble) * 1e6 + 0.5).toLong
      val terms = top.zipWithIndex.map { case ((_, _, c), i) => (lnm(i + 1L), lnm(c)) }
      val n = terms.length.toLong
      val (sx, sy) = (terms.map(_._1).sum, terms.map(_._2).sum)
      val sxx = terms.map(t => t._1 * t._1).sum
      val sxy = terms.map(t => t._1 * t._2).sum
      val den = n * sxx - sx * sx
      val want = if (den == 0) 0L
        else math.floor((n * sxy - sx * sy).toDouble / den.toDouble * 1e6 + 0.5).toLong
      assert(r.getAs[Long]("n_ranks") == n)
      assert(r.getAs[Long]("slope_micro") == want,
        s"$lang: slope ${r.getAs[Long]("slope_micro")} != scala OLS $want")
      assert(r.getAs[Long]("slope_micro") < 0,
        s"$lang: a rank-frequency fit over real counts must slope downward")
    }
  }

  test("q286: longer docs are over-represented vs uniform (the weighting works)") {
    // mean token count of the selected sample must exceed the corpus
    // mean: inclusion ∝ length, so this holds by construction unless the
    // Gumbel perturbation is mis-wired
    val sel = Round9Ops.q286GumbelTopK(spark, sf)
      .agg(avg(col("n_tok"))).head().getDouble(0)
    val all = Tables.documents(spark, sf)
      .select(size(graft.functions.Portable.tokens(col("text"))).cast("long").as("n"))
      .agg(avg(col("n"))).head().getDouble(0)
    assert(sel > all, s"weighted sample mean $sel must exceed corpus mean $all")
  }
}
