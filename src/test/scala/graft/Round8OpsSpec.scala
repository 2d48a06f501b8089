package graft

import graft.operators.Round8Ops
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-8 widening batch (q275–q277). */
class Round8OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q275: anchored on the benchmark set, flags are consistent") {
    val df = Round8Ops.q275LshDecontaminate(spark, sf)
    val nBench = Tables.documents(spark, sf)
      .filter(col("doc_id") % Round8Ops.LshBenchMod === 0).count()
    assert(df.count() == nBench, "one row per benchmark doc, flagged or not")
    val bad = df.filter(
      (col("contaminated") === 1 && (col("n_flagged") === 0 ||
        col("max_jac_micro") < (Round8Ops.LshDecontamTau * 1000000).toLong)) ||
      (col("contaminated") === 0 && (col("n_flagged") > 0 || col("max_jac_micro") > 0)))
    assert(bad.count() == 0, "contaminated flag must agree with counts and max jaccard")
    spark.catalog.clearCache()
  }

  test("q276: maintained occupancy conserves both populations; shares sum to ~1") {
    val df = Round8Ops.q276IvfMaintain(spark, sf).persist()
    val e = Tables.embeddings(spark, sf)
    val nState = e.filter(pmod(col("vec_id"), lit(Round8Ops.IvfDeltaMod)) =!= 0).count()
    val nDelta = e.filter(pmod(col("vec_id"), lit(Round8Ops.IvfDeltaMod)) === 0).count()
    val agg = df.agg(sum("n_state"), sum("n_delta"),
      sum("share_state_micro"), sum("share_delta_micro")).head()
    assert(agg.getLong(0) == nState, "every state vector lands in exactly one cell")
    assert(agg.getLong(1) == nDelta, "every delta vector lands in exactly one cell")
    // per-cell floor() loses < 1 micro-unit per cell (k = 8 cells)
    assert(math.abs(agg.getLong(2) - 1000000L) <= 8, s"state shares sum ${agg.getLong(2)}")
    assert(math.abs(agg.getLong(3) - 1000000L) <= 8, s"delta shares sum ${agg.getLong(3)}")
    val badDrift = df.filter(
      col("drift_micro") =!= abs(col("share_state_micro") - col("share_delta_micro")))
    assert(badDrift.count() == 0)
    df.unpersist()
    spark.catalog.clearCache()
  }

  test("q277: hashed-feature norms obey the signed-count arithmetic") {
    val df = Round8Ops.q277FeatureHash(spark, sf).persist()
    assert(df.count() > 0)
    val bad = df.filter(
      col("nnz") > Round8Ops.FeatureBins || col("l1") < col("nnz") ||
        col("l2sq") < col("l1") || col("n_collisions") < 0)
    assert(bad.count() == 0,
      "nnz <= bins, l1 >= nnz, l2sq >= l1 (integer v: v*v >= |v|), collisions >= 0")
    // parity conservation: each in-bin cancellation removes a ± pair, so
    // l1 and the doc's token count have equal parity
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.functions.Portable.tokens(col("text"))).as("n_tok"))
    val badParity = df.join(toks, "doc_id")
      .filter(pmod(col("l1"), lit(2)) =!= pmod(col("n_tok"), lit(2)))
    assert(badParity.count() == 0, "sum|v| must have the parity of the token count")
    df.unpersist()
    spark.catalog.clearCache()
  }

  test("q278: exactly k per stratum (or the whole stratum), deterministic across runs") {
    val df = Round8Ops.q278StratifiedReservoir(spark, sf).persist()
    val perSrc = df.groupBy(col("source"))
      .agg(count(lit(1)).as("k"), max(col("n_total")).as("n_total"))
    val bad = perSrc.filter(
      col("k") =!= least(lit(Round8Ops.ReservoirK.toLong), col("n_total")))
    assert(bad.count() == 0, "each stratum yields min(k, population) rows")
    val again = Round8Ops.q278StratifiedReservoir(spark, sf)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0,
      "selection must be a pure function of the data")
    df.unpersist()
    spark.catalog.clearCache()
  }

  test("q279: group folds conserve docs; group assignment cannot straddle") {
    val df = Round8Ops.q279GroupFolds(spark, sf).persist()
    val nDocs = Tables.documents(spark, sf).count()
    assert(df.agg(sum("n_docs")).head().getLong(0) == nDocs)
    // the defining property: fold is a function of the group key, so no
    // md5 group may appear under two folds
    val straddle = Tables.documents(spark, sf)
      .select(md5(col("text")).as("grp"),
        pmod(graft.functions.Portable.polyHash(md5(col("text"))) *
          lit(Round8Ops.FoldMixQ279), lit(graft.functions.Portable.P))
          .mod(Round8Ops.GroupFolds).as("fold"))
      .groupBy(col("grp")).agg(countDistinct(col("fold")).as("nf"))
      .filter(col("nf") > 1)
    assert(straddle.count() == 0)
    df.unpersist()
    spark.catalog.clearCache()
  }

  test("q281: temperature weights damp heads, upsample tails, shares sum to ~1") {
    val df = Round8Ops.q281TemperatureMix(spark, sf).persist()
    val shareSum = df.agg(sum("share_micro")).head().getLong(0)
    assert(math.abs(shareSum - 1000000L) <= df.count(), s"shares sum $shareSum")
    // α < 1 monotonicity: a strictly smaller source gets a strictly
    // larger upsample factor
    val rows = df.select(col("n_docs"), col("upsample_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    rows.sliding(2).foreach { case Array((n1, u1), (n2, u2)) =>
      if (n1 < n2) assert(u1 >= u2, s"n=$n1 up=$u1 vs n=$n2 up=$u2")
    case _ => ()
    }
    df.unpersist()
    spark.catalog.clearCache()
  }

  test("q282: every mined negative is lexically similar but dense-far") {
    val df = Round8Ops.q282HardNegatives(spark, sf).persist()
    assert(df.count() > 0, "fixture must yield hard negatives")
    val bad = df.filter(col("jac_micro") <= 0 ||
      col("dense_rank") <= Round8Ops.NegDenseK ||
      col("neg_rank") > Round8Ops.NegTopK)
    assert(bad.count() == 0)
    df.unpersist()
    spark.catalog.clearCache()
  }

  test("q283: span accounting is internally consistent") {
    val df = Round8Ops.q283SpanMaskPlan(spark, sf).persist()
    assert(df.count() > 0)
    val bad = df.filter(
      col("n_masked") > col("n_tok") || col("n_spans") > col("n_masked") ||
        (col("n_masked") > 0 && col("n_spans") === 0))
    assert(bad.count() == 0,
      "spans <= masked <= tokens; masked tokens imply at least one span")
    df.unpersist()
    spark.catalog.clearCache()
  }

  test("q280: per-source audit is anchored and internally consistent") {
    val df = Round8Ops.q280NormalizedDups(spark, sf).persist()
    val nSources = Tables.documents(spark, sf).select(col("source")).distinct().count()
    assert(df.count() == nSources, "one audit row per source, dups or not")
    val bad = df.filter(
      col("n_distinct_norm") > col("n_distinct_exact") ||
        col("n_distinct_exact") > col("n_docs") ||
        col("n_case_punct_dups") < 0 ||
        (col("n_dup_docs") === 0 && col("n_docs") =!= col("n_distinct_norm")))
    assert(bad.count() == 0,
      "norm-distinct <= exact-distinct <= docs; zero dup docs implies all distinct")
    df.unpersist()
    spark.catalog.clearCache()
  }
}
