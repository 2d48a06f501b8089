import java.nio.file.{Files, Paths}
val d = "/root/testdata/sf0.1"
val keys = Seq("q01_agg_filter","q02_scan_project","q03_join_broadcast","q12_sort_topk",
  "q35_minhash_lsh","q91_knn_native_expr","q94_asof_native","q44_range_join_binned",
  "q66_winnowing","q37_embed_neardup","q100_tpch_q18","q77_partition_pruned",
  "q78_bucketed_join","q80_dpp_join","q101_tpch_q5","q106_tpch_q19",
  "q86_decontaminate","q89_pq_adc","q113_tpch_q21","q114_paragraph_dedup",
  "q115_semantic_dedup","q123_inverted_index","q124_snapshot_diff",
  "q139_lateral","q109_unigram_quality","q148_ivf_assign",
  "q149_ivfpq_search","q150_entity_resolution","q151_pagerank",
  "q152_item_similarity","q153_tfidf_cosine","q154_bigram_quality",
  "q156_tpch_q9","q160_brand_lift","q162_triangle_count",
  "q163_containment","q165_interval_merge","q166_seasonal_anomaly",
  "q173_salted_join","q174_incremental_agg","q175_allpairs_prefix",
  "q176_recursive_bfs","q177_schema_drift","q179_heavy_hitters",
  "q180_pps_sample","q181_kmv_distinct","q182_lang_strata","q183_delta_dedup",
  "q185_bm25","q186_phrase_search","q187_skyline","q188_resample_interp",
  "q189_block_diff","q190_source_jaccard","q191_rendezvous",
  "q192_retractable_agg","q193_sliding_distinct","q194_cc_two_phase",
  "q195_hll","q196_embed_moments","q198_ref_integrity","q199_feature_label",
  "q200_media_batches","q201_multi_regression","q202_variant",
  "q203_sssp_weighted","q204_retrieval_eval","q205_dependency_audit",
  "q206_mad_outliers","q207_count_min","q208_bpe_merges",
  "q209_ks_drift","q210_ewma","q211_benford","q212_water_filling",
  "q213_covariance","q214_skipgram_cooc","q215_label_prop",
  "q216_multitouch_attribution","q217_cohort_ltv","q218_lag_correlation",
  "q219_shard_manifest","q220_join_ivm","q221_fixed_width",
  "q222_twap","q223_woe_iv",
  "q224_target_encode","q226_naive_bayes","q229_bloom_prefilter",
  "q231_compaction_plan","q232_hilbert_layout","q233_ppl_buckets",
  "q235_rrf_hybrid","q237_novelty","q241_cdc_chunks","q242_lsh_tuning",
  "q244_hilbert_native",
  "q245_dedup_weights","q246_rank_overlap","q247_ivf_recall",
  "q248_purged_split","q251_hll_merge","q253_markov_accuracy",
  "q254_quantile_norm","q256_auc_exact","q257_sprt",
  "q258_capture_recapture","q261_chain_merge","q263_ndcg",
  "q265_value_curve","q266_oof_encode","q268_skip_stats",
  "q270_anisotropy","q272_survival_km",
  "q67_ivf_search_trained","q147_semantic_dedup_trained",
  "q274_hybrid_ivf_lsh","q275_lsh_decontaminate","q276_ivf_maintain",
  "q277_feature_hash","q278_stratified_reservoir","q279_group_folds",
  "q280_normalized_dups","q281_temperature_mix","q282_hard_negatives",
  "q283_span_mask_plan","q284_triplet_bounded")
val sb = new StringBuilder
sb.append("# PLANS -- physical plans of headline queries (sf0.1, generated)\n\n")
sb.append("Auto-generated evidence for the plan properties claimed in SCALING.md:\n")
sb.append("pushdown + column pruning, broadcast joins, partial aggregation,\n")
sb.append("TakeOrderedAndProject top-k, the custom DotProductF and WinnowFingerprintsF\n")
sb.append("codegen expressions, the multi-probe LSH equi-join, the native\n")
sb.append("AsOfJoin exec, partition pruning over the bronze layer (q77:\n")
sb.append("non-empty PartitionFilters), the bucketed shuffle-free join (q78: SMJ\n")
sb.append("with zero hash exchanges), dynamic partition pruning (q80:\n")
sb.append("dynamicpruningexpression in the fact scan's PartitionFilters,\n")
sb.append("computed at runtime from the quarter-filtered month dim's\n")
sb.append("broadcast), the runtime bloom-filter join pruning plan\n")
sb.append("(bloom_filter_might_contain injected on the fact scan by a\n")
sb.append("selective dim filter), the executed AQE skew-split plan\n")
sb.append("(skew=true), the all-dims-broadcast TPC-H Q5 (q101: five broadcast\n")
sb.append("joins, lineitem the only streamed side), and disjunctive-predicate\n")
sb.append("pushdown (q106: OR-of-ANDs factored into per-scan PushedFilters plus\n")
sb.append("a join residual), the decontamination gram join (q86: dict-encoded\n")
sb.append("grams, broadcast bench index + broadcast df-cap anti-join), and the\n")
sb.append("PQ encode/ADC path (q89: broadcast codebook + broadcast lookup\n")
sb.append("table, corpus never shuffled before the final pivot-sum), the\n")
sb.append("adapted TPC-H Q21 (q113: semi+anti self-joins over the join-once\n")
sb.append("flagged relation, supplier dim broadcast), paragraph dedup (q114:\n")
sb.append("partial-aggregable keep-first -- HashAggregate pair on the block\n")
sb.append("hash, no window over the corpus), and SemDeDup (q115: broadcast\n")
sb.append("centroids; the only shuffle keys are cell ids), the single-pass\n")
sb.append("inverted-index build (q123: one scan, ObjectHashAggregate with a\n")
sb.append("partial_smallest_k bounded top-k aggregate -- O(k) posting state\n")
sb.append("per token -- and a TakeOrderedAndProject cap), and the CDC\n")
sb.append("snapshot diff (q124: one full-outer sort-merge join on the PK,\n")
sb.append("then a partial-aggregable class rollup), and the LATERAL\n")
sb.append("correlated subquery (q139: Catalyst decorrelates the naive\n")
sb.append("per-row spelling into WindowGroupLimit + broadcast join -- no\n")
sb.append("row-at-a-time execution survives planning), the capped unigram\n")
sb.append("LM (q109: TakeOrderedAndProject top-K vocabulary, broadcast LEFT\n")
sb.append("join with the OOV coalesce -- the model broadcast is K rows\n")
sb.append("whatever the corpus), and the trained IVF assignment (q148:\n")
sb.append("broadcast k x dim model, the dist_sq_a codegen fold inside\n")
sb.append("WholeStageCodegen, per-vector argmin as a bounded window),\n")
sb.append("the IVF-PQ search (q149: every model table -- centroids,\n")
sb.append("residual codebook, per-cell LUT -- enters as a broadcast;\n")
sb.append("the corpus never shuffles before the final |candidates| x M\n")
sb.append("pivot-sum), sorted-neighborhood entity resolution (q150: one\n")
sb.append("window sort per block, lead()s + explode -- W x N candidate\n")
sb.append("rows, no quadratic block join), and PageRank (q151: per\n")
sb.append("iteration one shuffle joining ranks onto edge sources and one\n")
sb.append("partial-aggregable destination rollup over fixed-point sums),\n")
sb.append("and item-item similarity (q152: capped-basket self-join, the\n")
sb.append("(s1, s2) rollup partial-aggregable, degree tables broadcast),\n")
sb.append("TPC-H Q9 over the derived partsupp (q156: part dim filtered and\n")
sb.append("broadcast before the lineitem join, partsupp derived once),\n")
sb.append("brand lift (q160: the (order, brand) distinct is the only\n")
sb.append("corpus-sized shuffle; brand pair rollup partial-aggregable),\n")
sb.append("triangle census (q162: oriented edges lo->hi so each triangle\n")
sb.append("counts once; the wedge join hits the smaller oriented list),\n")
sb.append("containment dedup (q163: q40's df-capped inverted index, pair\n")
sb.append("candidates only where an informative shingle collides -- never\n")
sb.append("|docs|^2), interval merge (q165: one shuffle on user_id, islands\n")
sb.append("via running-max window then two partial-aggregable rollups),\n")
sb.append("and seasonal anomaly (q166: hour rollup partial-aggregable, the\n")
sb.append("168-slot baseline re-key over already-aggregated rows, baseline\n")
sb.append("table broadcast back onto the hourly probe), weighted SSSP\n")
sb.append("(q203: per round one frontier-edge join plus one MIN rollup,\n")
sb.append("edges persisted hash-partitioned once), the dependency audit\n")
sb.append("(q205: each IND a distinct-project LEFT ANTI join, each FD a\n")
sb.append("partial-aggregable count-distinct -- 2-column scans only), the\n")
sb.append("Count-Min sketch (q207: per-distinct-token probes against a\n")
sb.append("256-cell broadcast counter grid), BPE training (q208: pair\n")
sb.append("counts per distinct word, the chosen pair a broadcast 1-row\n")
sb.append("relation, merge application one codegen'd replace()), KS drift\n")
sb.append("(q209: per-(type,value) pre-aggregation before the type-keyed\n")
sb.append("cumsum window, integer cross-products until one division), and\n")
sb.append("EWMA (q210: domain-bounded (type, day) rollup, then a row-local\n")
sb.append("sequential array fold), water-filling (q212: ordered window\n")
sb.append("over the |sources| relation only), covariance (q213: row-local\n")
sb.append("outer product into ObjectHashAggregate partials -- one d^2\n")
sb.append("buffer per partition through the exchange), skip-gram (q214:\n")
sb.append("bounded lead() fan-out, TakeOrderedAndProject top-50), label\n")
sb.append("propagation (q215: masked x labeled joined ON the trained\n")
sb.append("cell), multi-touch attribution (q216: per-user bounded join,\n")
sb.append("conversion-keyed rank windows), cohort LTV (q217: integer\n")
sb.append("calendar keys, cohort-partitioned cumsum), lag correlation\n")
sb.append("(q218: one (type, day) rollup then |types|^2 x lags cells),\n")
sb.append("and the shard manifest (q219: one scan, one groupBy(shard)),\n")
sb.append("join IVM (q220: broadcast dim patch + delta join, no\n")
sb.append("recompute), the DSv2 fixed-width connector (q221: pushed\n")
sb.append("filters and pruned fields visible in the custom scan), TWAP\n")
sb.append("(q222: user-keyed lead window + integer-weighted rollup), and\n")
sb.append("WOE binning (q223: 1-row bounds broadcast, B-row rollup).\n")
sb.append("Regenerate with tools/gen_plans.sh.\n")
keys.foreach { k =>
  val df = graft.SparkEntry.queries(k)(spark, d)
  val p = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
  sb.append(s"\n## $k\n\n```\n")
  sb.append(p.linesIterator.take(45).mkString("\n"))
  sb.append("\n```\n")
}
// Runtime AQE skew-split evidence (AqeSkewSpec's shape, executed so the
// FINAL adaptive plan shows the skew=true partition splits): 95% of left
// rows share one key; shrunk thresholds let sf-local data trigger the
// same OptimizeSkewedJoin path a 100 TB hot key would.
{
  import org.apache.spark.sql.functions._
  val s2 = spark.newSession()
  s2.conf.set("spark.sql.adaptive.enabled", "true")
  s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
  s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
  s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
  s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
  s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
  s2.conf.set("spark.sql.shuffle.partitions", "8")
  val left = s2.range(0, 200000)
    .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
      col("id").as("v"))
  val right = s2.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
  val joined = left.join(right, "k")
  joined.collect() // executes THIS QueryExecution so AQE finalizes it
  val p = joined.queryExecution.executedPlan.toString
  sb.append("\n## aqe_skew_join (executed -- final adaptive plan)\n\n```\n")
  sb.append(p.linesIterator.take(45).mkString("\n"))
  sb.append("\n```\n")
}
// Runtime bloom-filter join pruning (RuntimeBloomFilterSpec's shape): a
// selective dim filter injects bloom_filter_might_contain on the fact
// side so non-matching rows die at the scan — shown here on the real
// lineitem⋈orders shapes at sf0.1.
{
  import org.apache.spark.sql.functions._
  val s3 = spark.newSession()
  s3.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
  s3.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
  s3.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
  s3.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
  val li = graft.Tables.lineitem(s3, d)
  val o = graft.Tables.orders(s3, d).filter(col("o_totalprice") > 450000.0)
  val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
    .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
  val p = j.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
  sb.append("\n## runtime_bloom_filter_join (bloom_filter_might_contain on the fact scan)\n\n```\n")
  sb.append(p.linesIterator.take(45).mkString("\n"))
  sb.append("\n```\n")
}
Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE PLANS.md " + sb.length + " chars")
sys.exit(0)
