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
