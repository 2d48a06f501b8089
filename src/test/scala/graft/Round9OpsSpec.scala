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
