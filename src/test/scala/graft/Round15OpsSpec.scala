package graft

import graft.operators.{GovernanceOps, Round13Ops, Round14Ops, Round15Ops}
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 mechanism proofs: the continual-release counter's dyadic
  * decomposition, node noise, and prefix assembly are recounted in
  * plain Scala; the exponential-mechanism quantile's selection
  * distribution is ENUMERATED over every uniform (the q334 discipline);
  * the portfolio's new rows and zCDP bound are pinned live. */
class Round15OpsSpec extends AnyFunSuite {
  import TestSpark._

  private val P = 1000000007L

  /** Independent plain-Scala polyHash (fold (acc·31 + ascii) mod P) —
    * the fixture strings are ASCII, so codepoint == byte. */
  private def pHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)

  private def uOf(parts: String*): Long =
    (pHash(parts.mkString("|")) * Round13Ops.DpScramble) % P % Round13Ops.DpD

  /** Independent plain-Scala inverse CDF of the α = 1/2 tier
    * (duplicated from Round13OpsSpec on purpose — self-contained). */
  private def noiseRef(u: Long): Long = {
    val half = 1L << 19
    def l2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    if (u < half) { if (u == 0) -20 else -(19 - l2(u)) }
    else if (u < 2L * half) 0
    else { val v = Round13Ops.DpD - 1 - u; if (v == 0) 20 else 19 - l2(v) }
  }

  // ---- q335: continual-release counter ----

  test("q335 decomposition: every prefix is covered EXACTLY by popcount(t+1) disjoint nodes") {
    (0 until Round15Ops.CrT).foreach { t =>
      val nodes = Round15Ops.crPrefixNodes(t)
      assert(nodes.length == java.lang.Integer.bitCount(t + 1),
        s"prefix $t must read popcount(${t + 1}) nodes")
      // nodes cover [0, t] disjointly: expand each to its epoch range
      val covered = nodes.flatMap { case (l, i) =>
        (i << l) until ((i + 1) << l) map (_.toLong)
      }
      assert(covered.sorted == (0L to t.toLong),
        s"prefix $t decomposition must tile [0, $t] exactly")
      // ...and respects the Chan–Dwork read bound
      assert(nodes.length <= Round15Ops.CrLevels, s"prefix $t read bound")
    }
    // the published node grid is the full fixed tree: 2T−1 nodes
    assert(Round15Ops.CrNodes.length == 2 * Round15Ops.CrT - 1)
    assert(Round15Ops.CrNodes.forall { case (l, i, lo, hi) =>
      lo == (i << l) && hi == ((i + 1) << l)
    })
  }

  test("q335: node counts, node noise, and every prefix recounted in plain Scala") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    val epochCnt = docs.groupBy { case (id, lang) => (lang, id % 8) }
      .view.mapValues(_.size.toLong).toMap
    val langs = docs.map(_._2).distinct.sorted
    // independent node truth: sum of covered epoch counts
    def nodeTrue(lang: String, l: Long, i: Long): Long =
      ((i << l) until ((i + 1) << l)).map(e =>
        epochCnt.getOrElse((lang, e), 0L)).sum
    val rows = Round15Ops.q335ContinualCounter(spark, sf).collect()
    // one row per (lang, epoch, decomposition node) PLUS one epoch = −1
    // sentinel per published-but-never-prefix-read node: the graded
    // output is the FULL released tree
    val usedPairs = (0 until 8).map(t => java.lang.Integer.bitCount(t + 1)).sum
    val usedNodes = (0 until 8).flatMap(Round15Ops.crPrefixNodes).distinct.size
    assert(rows.length == langs.length *
      (usedPairs + (2 * Round15Ops.CrT - 1 - usedNodes)))
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val (epoch, level, idx) = (r.getAs[Long]("epoch"),
        r.getAs[Long]("level"), r.getAs[Long]("idx"))
      val u = uOf(Round13Ops.DpSalt, "tree", lang, level.toString, idx.toString)
      assert(r.getAs[Long]("node_u") == u, s"node ($lang,$level,$idx) u")
      assert(r.getAs[Long]("node_noise") == noiseRef(u))
      assert(r.getAs[Long]("node_n_true") == nodeTrue(lang, level, idx))
      if (epoch == -1L) {
        // a released tree node no prefix of this grid reads: noised and
        // published, but carrying no prefix assembly
        assert(!(0 until 8).flatMap(Round15Ops.crPrefixNodes)
          .contains((level, idx)), "sentinel must be a never-read node")
        assert(r.isNullAt(r.fieldIndex("prefix_true")))
        assert(r.isNullAt(r.fieldIndex("prefix_released")))
        assert(r.isNullAt(r.fieldIndex("n_nodes_read")))
      } else {
        // the prefix halves: true = direct cumulative recount; released =
        // clamped sum of (count + frozen node draw) over the decomposition
        val dec = Round15Ops.crPrefixNodes(epoch.toInt)
        val pTrue = (0L to epoch).map(e => epochCnt.getOrElse((lang, e), 0L)).sum
        assert(r.getAs[Long]("prefix_true") == pTrue, s"($lang,$epoch) prefix_true")
        val pRel = dec.map { case (l, i) =>
          nodeTrue(lang, l, i) +
            noiseRef(uOf(Round13Ops.DpSalt, "tree", lang, l.toString, i.toString))
        }.sum
        assert(r.getAs[Long]("prefix_released") == math.max(0L, pRel))
        assert(r.getAs[Long]("n_nodes_read") == dec.length)
      }
      // the ledger charges the tree HEIGHT, not the T reads
      assert(r.getAs[Long]("tree_height") == Round15Ops.CrLevels)
      assert(r.getAs[Long]("eps_total_micro") ==
        Round15Ops.CrLevels * Round13Ops.DpEpsCellMicro)
      assert(r.getAs[Long]("delta_total_num") ==
        Round15Ops.CrLevels * Round13Ops.DpDeltaNum)
      assert(r.getAs[Long]("delta_total_den") == Round13Ops.DpD)
      assert(r.getAs[Long]("n_nodes_total") ==
        langs.length.toLong * (2 * Round15Ops.CrT - 1))
    }
    // consecutive prefixes share frozen draws: epoch 0 and epoch 1 both
    // publish finite releases whose difference is NOT the raw epoch-1
    // count unless their decompositions happen to telescope — what IS
    // invariant is that re-assembling any prefix re-reads the same node
    // draws, which the per-row replay above already proves. Spot-check
    // the full-range prefix (epoch 7) reads exactly the root node.
    val root = rows.filter(r => r.getAs[Long]("epoch") == 7)
    assert(root.nonEmpty && root.forall(r =>
      r.getAs[Long]("level") == 3 && r.getAs[Long]("n_nodes_read") == 1))
  }

  // ---- q339: range queries over the published tree ----

  test("q339 cover: every range tiles exactly within the 2(log T - 1) segment-tree bound") {
    for (a <- 0 until Round15Ops.CrT; b <- a until Round15Ops.CrT) {
      val nodes = Round15Ops.crRangeNodes(a, b)
      val covered = nodes.flatMap { case (l, i) =>
        (i << l) until ((i + 1) << l) map (_.toLong)
      }
      assert(covered.sorted == (a.toLong to b.toLong),
        s"range [$a,$b] must tile exactly")
      assert(nodes.length <= 2 * (Round15Ops.CrLevels - 1),
        s"range [$a,$b] cover size ${nodes.length}")
      // canonical: nodes are maximal (no two adjacent same-level
      // siblings that could merge)
      nodes.foreach { case (l, i) =>
        val mergeable = l + 1 < Round15Ops.CrLevels && i % 2 == 0 &&
          nodes.contains((l, i + 1))
        assert(!mergeable, s"range [$a,$b] has a mergeable pair at level $l")
      }
    }
    // prefixes are the a = 0 special case and the two covers agree
    (0 until Round15Ops.CrT).foreach { t =>
      assert(Round15Ops.crRangeNodes(0, t).sorted ==
        Round15Ops.crPrefixNodes(t).sorted)
    }
  }

  test("q339: pure post-processing — identical node draws to q335, ranges recounted") {
    import org.apache.spark.sql.functions.col
    val q335 = Round15Ops.q335ContinualCounter(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("level"),
        r.getAs[Long]("idx")) ->
        (r.getAs[Long]("node_n_true"), r.getAs[Long]("node_u"),
          r.getAs[Long]("node_noise"))).toMap
    val rows = Round15Ops.q339DpRangeQuery(spark, sf).collect()
    val langs = rows.map(_.getAs[String]("lang")).distinct
    val coverSize = (for { a <- 0 until Round15Ops.CrT; b <- a until Round15Ops.CrT }
      yield Round15Ops.crRangeNodes(a, b).length).sum
    assert(rows.length == langs.length * coverSize)
    rows.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[Long]("level"),
        r.getAs[Long]("idx"))
      // THE claim: q339 re-reads q335's published draws — same counts,
      // same uniforms, same noise, no fresh randomness anywhere
      val (nTrue, u, noise) = q335(key)
      assert(r.getAs[Long]("node_n_true") == nTrue)
      assert(r.getAs[Long]("node_u") == u)
      assert(r.getAs[Long]("node_noise") == noise)
      // ...which is why the marginal price is exactly zero
      assert(r.getAs[Long]("eps_marginal_micro") == 0)
      assert(r.getAs[Long]("eps_tree_micro") == Round15Ops.CrEpsMicro)
      // range sums assemble from the cover
      val (a, b) = (r.getAs[Long]("a").toInt, r.getAs[Long]("b").toInt)
      val cover = Round15Ops.crRangeNodes(a, b)
      assert(r.getAs[Long]("n_nodes_read") == cover.length)
      val lang = r.getAs[String]("lang")
      val rTrue = cover.map(n => q335((lang, n._1, n._2))._1).sum
      val rRel = cover.map { n =>
        val (t, _, z) = q335((lang, n._1, n._2)); t + z
      }.sum
      assert(r.getAs[Long]("range_true") == rTrue)
      assert(r.getAs[Long]("range_released") == math.max(0L, rRel))
    }
  }

  // ---- q336: exact exponential-mechanism quantile ----

  /** Independent Scala weights for one (lang, q) from raw token counts. */
  private def quantWeights(lenBs: Seq[Long], qPct: Long): (Seq[Long], Long, Long) = {
    val cap = Round15Ops.QuantCap
    val n = lenBs.length.toLong
    val r = (qPct * n + 99) / 100
    val weights = (0L to cap).map { b =>
      val nLe = lenBs.count(_ <= b).toLong
      val err = math.abs(nLe - r)
      1L << (Round15Ops.QuantUtilClamp - math.min(err, Round15Ops.QuantUtilClamp)).toInt
    }
    (weights, weights.sum, r)
  }

  test("q336 enumeration: the selection distribution is EXACTLY w_b / W over every uniform") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val lang = "en"
    val lenBs = docs.filter(_._1 == lang).map { case (_, t) =>
      math.min(t.split(" ").count(_.nonEmpty).toLong / GovernanceOps.KAnonLenBucket,
        Round15Ops.QuantCap)
    }.toSeq
    assert(lenBs.nonEmpty)
    val (weights, wTotal, _) = quantWeights(lenBs, 50L)
    assert(wTotal <= (Round15Ops.QuantCap + 1) * (1L << Round15Ops.QuantUtilClamp.toInt),
      "bounded total weight keeps the draw enumerable and the mod bias small")
    // enumerate EVERY uniform u in [0, W): interval selection must
    // realize frequencies exactly equal to the integer weights — the
    // mechanism's selection distribution is the exact rational w_b/W
    val cum = weights.scanLeft(0L)(_ + _)
    val freq = new Array[Long](weights.length)
    var u = 0L
    while (u < wTotal) {
      val b = cum.indexWhere(_ > u) - 1
      freq(b) += 1
      u += 1
    }
    assert(freq.toSeq == weights, "realized selection histogram == weights")
    // adjacent-dataset ε: adding one document moves every n_le by ≤ 1
    // and r by ≤ 1, so clamped utility moves by ≤ 1 per bucket → each
    // weight by ≤ 2× and W by ≤ 2× → the selection probability ratio is
    // ≤ 4 = e^(2 ln 2): the conservative EM bound the ledger prints.
    assert(Round15Ops.QuantEpsMicro == 2 * Round13Ops.DpEpsCellMicro)
  }

  test("q336: every column recounted in plain Scala, selected bucket replayed") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1).view.mapValues(_.map { case (_, t) =>
      math.min(t.split(" ").count(_.nonEmpty).toLong / GovernanceOps.KAnonLenBucket,
        Round15Ops.QuantCap)
    }.toSeq).toMap
    val rows = Round15Ops.q336DpQuantile(spark, sf).collect()
    assert(rows.length ==
      byLang.size * Round15Ops.QuantPcts.length * (Round15Ops.QuantCap + 1).toInt)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val qPct = r.getAs[Long]("q_pct")
      val bucket = r.getAs[Long]("bucket")
      val lenBs = byLang(lang)
      val (weights, wTotal, rTarget) = quantWeights(lenBs, qPct)
      val nLe = lenBs.count(_ <= bucket).toLong
      assert(r.getAs[Long]("cnt") == lenBs.count(_ == bucket).toLong)
      assert(r.getAs[Long]("n_le") == nLe)
      assert(r.getAs[Long]("n_public") == lenBs.length.toLong)
      assert(r.getAs[Long]("r_target") == rTarget)
      val err = math.abs(nLe - rTarget)
      assert(r.getAs[Long]("err") == err)
      assert(r.getAs[Long]("util") ==
        -math.min(err, Round15Ops.QuantUtilClamp))
      assert(r.getAs[Long]("weight") == weights(bucket.toInt))
      assert(r.getAs[Long]("cum_w") == weights.take(bucket.toInt + 1).sum)
      assert(r.getAs[Long]("w_total") == wTotal)
      // replay the draw and the interval selection independently
      val draw = (pHash(Seq(Round13Ops.DpSalt, "quant", lang, qPct.toString)
        .mkString("|")) * Round13Ops.DpScramble) % P % wTotal
      assert(r.getAs[Long]("u_draw") == draw)
      val cum = weights.scanLeft(0L)(_ + _)
      val selected = (cum.indexWhere(_ > draw) - 1).toLong
      assert(r.getAs[Boolean]("is_selected") == (bucket == selected))
      assert(r.getAs[Long]("selected_bucket") == selected)
      // pure ε-DP: no truncation anywhere, δ is exactly zero
      assert(r.getAs[Long]("delta_num") == 0 && r.getAs[Long]("delta_den") == 1)
      assert(r.getAs[Long]("eps_op_micro") ==
        Round15Ops.QuantPcts.length * Round15Ops.QuantEpsMicro)
    }
  }

  // ---- q337: band-index erasure ----

  test("q337: maintained == frozen-list scratch everywhere; hot drift recounted in plain Scala") {
    import org.apache.spark.sql.functions.col
    val rows = Round15Ops.q337BandErasure(spark, sf).collect()
    assert(rows.nonEmpty)
    // the load-bearing contract: tombstone removal equals the from-raw
    // rebuild UNDER THE FROZEN HOT LIST, in every domain
    assert(rows.forall(_.getAs[Boolean]("consistent")),
      "maintained removal must equal the frozen-statistics rebuild")
    val bb = rows.filter(_.getAs[String]("domain") == "band_bucket")
    assert(bb.exists(_.getAs[Boolean]("dissolved")),
      "some candidate bucket must dissolve below 2 members")
    assert(bb.exists(r => r.getAs[Long]("n_deleted") > 0 &&
      r.getAs[Long]("n_after") == 0L),
      "a fully-deleted bucket must read 0, not disappear")
    // plain-Scala recount of the index statistics from raw text: 3-gram
    // shingle df over distinct per-doc sets, the hot list, the drift
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(text: String): Set[Long] = {
      val hs = text.split(" ").filter(_.nonEmpty).map(pHash)
      hs.sliding(3).filter(_.length == 3)
        .map(a => ((a(0) * 31 + a(1)) % P * 31 + a(2)) % P).toSet
    }
    val df = new scala.collection.mutable.HashMap[Long, (Long, Long)]()
    docs.foreach { case (id, text) =>
      val del = if (id % graft.operators.Round14Ops.DelMod == 0) 1L else 0L
      shingles(text).foreach { sh =>
        val (a, b) = df.getOrElse(sh, (0L, 0L)); df(sh) = (a + 1, b + del)
      }
    }
    val hotScala = df.filter(_._2._1 > Round15Ops.EraseDfCap)
    val hotRows = rows.filter(_.getAs[String]("domain") == "hot_shingle")
    assert(hotRows.length == hotScala.size, "frozen hot list size")
    hotRows.foreach { r =>
      val (nBefore, nDeleted) = hotScala(r.getAs[Long]("key"))
      assert(r.getAs[Long]("n_before") == nBefore)
      assert(r.getAs[Long]("n_deleted") == nDeleted)
      assert(r.getAs[Boolean]("flipped") ==
        (nBefore - nDeleted <= Round15Ops.EraseDfCap))
    }
    assert(hotRows.exists(_.getAs[Boolean]("flipped")),
      "deletion must flip some shingle's hotness — the retrain-gate drift")
    // WHY the frozen list is a contract and not a shortcut: the fresh
    // hot list over the survivors genuinely differs (exactly the flips),
    // so a fresh-statistics rebuild would re-cap different shingles and
    // drift from the maintained state
    val freshHot = df.filter { case (_, (n, dl)) =>
      n - dl > Round15Ops.EraseDfCap
    }.keySet
    assert(freshHot != hotScala.keySet,
      "post-deletion statistics must drift from the frozen list")
    // totals: the indexed-doc count is the docs with a nonempty capped
    // set under the frozen list
    val indexed = docs.filter { case (_, text) =>
      (shingles(text) -- hotScala.keySet).nonEmpty
    }
    val tot = rows.filter(_.getAs[String]("domain") == "total:docs").head
    assert(tot.getAs[Long]("n_before") == indexed.length.toLong)
    assert(tot.getAs[Long]("n_deleted") ==
      indexed.count(_._1 % graft.operators.Round14Ops.DelMod == 0).toLong)
  }

  // ---- q338: the GRFT container parser ----

  test("q338 parser: a hand-built golden container parses to exact field values") {
    import graft.multimodal.Multimodal.ContainerCodec
    // build the bytes BY HAND, independent of the Spark-side builder:
    // magic | v1 | kind 2 | w=300 | h=7 | 2 frames ("ab", "xyz") | trailer
    def b16(x: Int): Seq[Byte] = Seq(((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
    val payload = "ab".getBytes("UTF-8") ++ "xyz".getBytes("UTF-8")
    val sum = payload.map(_ & 0xff).sum
    val golden = ("GRFT".getBytes("UTF-8").toSeq :+ 1.toByte :+ 2.toByte) ++
      b16(300) ++ b16(7) ++ Seq(2.toByte) ++
      b16(2) ++ "ab".getBytes("UTF-8").toSeq ++
      b16(3) ++ "xyz".getBytes("UTF-8").toSeq ++ b16(sum % 65536)
    val p = ContainerCodec.parse(42L, golden.toArray)
    assert(p.parse_ok && p.magic_ok && p.checksum_ok)
    assert(p.version == 1 && p.kind_code == 2)
    assert(p.width == 300 && p.height == 7)
    assert(p.n_frames == 2 && p.n_payload == 5 && p.payload_sum == sum)
    assert(p.checksum_stored == p.checksum_computed)
    // a flipped trailer fails the checksum but still parses structurally
    val rot = golden.toArray
    rot(rot.length - 1) = (rot(rot.length - 1) + 1).toByte
    val pr = ContainerCodec.parse(42L, rot)
    assert(pr.parse_ok && !pr.checksum_ok)
  }

  test("q338 parser: structural damage quarantines (parse_ok=false), never throws") {
    import graft.multimodal.Multimodal.ContainerCodec
    // too short for a header
    assert(!ContainerCodec.parse(1L, Array[Byte](1, 2, 3)).parse_ok)
    // wrong magic
    val junk = ("JUNK" + " " * 20).getBytes("UTF-8")
    val pj = ContainerCodec.parse(2L, junk)
    assert(!pj.parse_ok && !pj.magic_ok)
    // frame length overruns the buffer
    def b16(x: Int): Seq[Byte] = Seq(((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
    val overrun = ("GRFT".getBytes("UTF-8").toSeq :+ 1.toByte :+ 0.toByte) ++
      b16(1) ++ b16(1) ++ Seq(1.toByte) ++ b16(9999) ++ "ab".getBytes("UTF-8").toSeq
    val po = ContainerCodec.parse(3L, overrun.toArray)
    assert(!po.parse_ok && po.magic_ok, "magic read before the overrun is kept")
    // trailing garbage after the trailer position
    val slack = ("GRFT".getBytes("UTF-8").toSeq :+ 1.toByte :+ 0.toByte) ++
      b16(1) ++ b16(1) ++ Seq(0.toByte) ++ b16(0) ++ Seq(0.toByte)
    assert(!ContainerCodec.parse(4L, slack.toArray).parse_ok,
      "trailer must close the container exactly")
  }

  test("q338: bitrot subset fails checksum, everything else round-trips clean") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.MultimodalQueries
      .q338MediaContainer(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("parse_ok")),
      "every constructed container must parse structurally")
    assert(rows.forall(_.getAs[Boolean]("magic_ok")))
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Boolean]("checksum_ok") ==
        (id % graft.multimodal.Multimodal.BitrotMod != 0),
        s"media $id checksum verdict")
    }
    assert(rows.exists(!_.getAs[Boolean]("checksum_ok")),
      "the bitrot path must be exercised")
    // kind routing and frame counts recovered from the BYTES match the
    // construction rule
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Long]("kind_code") == id % 3)
      assert(r.getAs[Long]("n_frames") == 1 + id % 3)
    }
  }

  // ---- q333: the new portfolio rows and the zCDP bound ----

  test("q333: new rows' n_cells pinned to the releases' ACTUAL output sizes; zCDP bound recomputed") {
    import org.apache.spark.sql.functions.col
    val port = Round14Ops.q333DpPortfolio(spark, sf).collect()
    val docsRows = port.filter(_.getAs[String]("dataset") == "documents")
    val byRel = docsRows.map(r => r.getAs[String]("release") -> r).toMap
    // q335's live cell count == the full published node grid
    val q335Nodes = Round15Ops.q335ContinualCounter(spark, sf)
      .select(col("lang"), col("level"), col("idx")).distinct().count()
    assert(byRel("q335_dp_continual").getAs[Long]("n_cells") == q335Nodes)
    assert(byRel("q335_dp_continual").getAs[Long]("eps_micro") ==
      Round15Ops.CrEpsMicro)
    assert(byRel("q335_dp_continual").getAs[Long]("delta_num") ==
      Round15Ops.CrDeltaNum)
    // q336's live cell count == the released selections (one per lang×q)
    val q336Sel = Round15Ops.q336DpQuantile(spark, sf)
      .filter(col("is_selected"))
      .select(col("lang"), col("q_pct")).distinct().count()
    assert(byRel("q336_dp_quantile").getAs[Long]("n_cells") == q336Sel)
    assert(byRel("q336_dp_quantile").getAs[Long]("eps_micro") ==
      Round15Ops.QuantOpEpsMicro)
    assert(byRel("q336_dp_quantile").getAs[Long]("delta_num") == 0)
    // zCDP bound: ρ = Σ ε_i²/2 kept exact as rho_e12 = Σ ε_i,micro²;
    // the (ε, δ′)-conversion at δ′ = 10⁻⁶ recomputed independently
    val rhoE12 = docsRows.map(r => {
      val e = r.getAs[Long]("eps_micro"); e * e
    }).sum
    docsRows.foreach { r =>
      assert(r.getAs[Long]("rho_e12") == rhoE12)
      val rho = rhoE12 / 2.0e12
      val want = math.floor(
        (rho + 2.0 * math.sqrt(rho * 13.815510557964274)) * 1.0e6 + 0.5).toLong
      assert(r.getAs[Long]("eps_zcdp_micro") == want)
      assert(r.getAs[Long]("eps_operative_micro") ==
        math.min(r.getAs[Long]("total_eps_micro"), want))
      assert(r.getAs[Long]("zcdp_delta_prime_exp") == 6)
    }
    // the decision-grade readout: at THIS portfolio shape (few, large
    // releases) the naive sum is still the tighter bound — the zCDP
    // route wins only when k ≫ 2·ln(1/δ′)/ε̄, and the steward column
    // shows exactly that
    val r0 = docsRows.head
    assert(r0.getAs[Long]("total_eps_micro") < r0.getAs[Long]("eps_zcdp_micro"))
    assert(r0.getAs[Long]("eps_operative_micro") ==
      r0.getAs[Long]("total_eps_micro"))
  }
}
