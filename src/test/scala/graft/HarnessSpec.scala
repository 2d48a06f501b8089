package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the graded-surface contract itself: `SparkEntry.queries` /
  * `oracleSql` are built by merging per-object Maps with `++`, where a
  * duplicated key would silently overwrite a query — these checks make
  * that failure loud. */
class HarnessSpec extends AnyFunSuite {

  private val RowsOnly = Set("q67_ivf_search_trained", "q90_minhash_fast",
    "q92_sketches", "q93_sample", "q147_semantic_dedup_trained")

  test("every query key is well-formed and its qNN prefix is unique") {
    val keys = SparkEntry.queries.keys.toSeq
    keys.foreach(k => assert(k.matches("^q\\d+_[a-z0-9_]+$"), s"bad key: $k"))
    val nums = keys.map(_.takeWhile(_ != '_'))
    val dups = nums.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"colliding query numbers: ${dups.mkString(", ")}")
  }

  test("oracles cover exactly the non-rows-only queries") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).mkString(", ")}")
    assert(q -- o == RowsOnly,
      s"oracle-less queries drifted: ${((q -- o) -- RowsOnly).mkString(", ")}")
  }

  // single-row scalar aggregates: order is trivially deterministic
  private val SingleRow = Set("q96_tpch_q6", "q97_tpch_q14", "q105_tpch_q17",
    "q106_tpch_q19", "q122_funnel", "q141_curation_funnel", "q164_funnel_latency",
    "q251_hll_merge", "q256_auc_exact", "q258_capture_recapture", "q262_bloom_fpr")

  test("every oracle is non-empty SQL ordered by something (or single-row)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty)
      assert(sql.toUpperCase.contains("ORDER BY") || SingleRow.contains(k),
        s"$k oracle lacks ORDER BY — the hash compare needs deterministic order")
    }
  }
}
