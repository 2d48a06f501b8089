package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 widening: DSIR-style importance weighting against a held-out
  * target corpus, and reproducible weighted sampling without replacement
  * via hash-seeded Gumbel keys — two more training-data-selection
  * primitives, each DuckDB-replayed exactly.
  */
object Round9Ops {
  type Q = (SparkSession, String) => DataFrame

  /** Feature buckets for q285's hashed bag-of-tokens LM (DSIR's hashed
    * n-gram features; 256 keeps the two models broadcast-trivial and
    * collision-rich on the fixture). */
  val DsirBuckets = 256
  /** Reported top docs per source in q285/q286. */
  val DsirTopK = 3

  /** q285 — DSIR-style importance weights (Xie et al., "Data Selection
    * for Language Models via Importance Resampling"): score every RAW
    * document by how much more likely its hashed-feature bag is under a
    * TARGET-corpus model than under the raw-corpus model — the
    * log-likelihood ratio Σ_b n_doc(b)·(ln p_tgt(b) − ln p_raw(b)) over
    * [[DsirBuckets]] hashed token buckets with add-1 smoothing. The
    * target is the q275 benchmark slice (doc_id % LshBenchMod = 0), so
    * the weights rank raw docs by benchmark-likeness — the importance-
    * resampling selection signal, with q286 as the sampler that would
    * consume it.
    *
    * Scale shape: both LMs are [[DsirBuckets]]-row tables (broadcast,
    * domain-anchored so empty buckets exist with their smoothed mass);
    * per-doc scoring is one (doc, bucket) aggregate joined against the
    * broadcast model — work ∝ corpus tokens, nothing quadratic, and the
    * per-source rank window is the q278 top-k shape.
    *
    * Float parity: each bucket's ln is 6-dp micro-rounded BEFORE any
    * sum (`floor(ln·1e6 + 0.5)` — libm ln differs by 1 ulp across
    * engines, the [[graft.operators.Det]] discipline applied to logs,
    * as in q109), so every per-doc weight is an exact BIGINT dot
    * product of integer counts with integer micro-logs. */
  def q285DsirWeights(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("tok"))
    // dict-encode: the interpreted polynomial hash runs once per
    // DISTINCT token (q35/q86/q277 discipline)
    val dict = tok.select(col("tok")).distinct()
      .withColumn("b", pmod(polyHash(col("tok")), lit(DsirBuckets)))
    val tb = tok.join(dict, "tok")
      .select(col("doc_id"), col("source"), col("b"))
    val isBench = pmod(col("doc_id"), lit(Round8Ops.LshBenchMod)) === 0
    val tgt = tb.filter(isBench).groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val raw = tb.filter(!isBench).groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tots = tgt.agg(sum(col("ct")).as("tt"))
      .join(raw.agg(sum(col("cr")).as("tr")), lit(true))
    // bucket-domain anchor: every bucket 0..B-1 gets its smoothed mass
    def lnMicro(n: org.apache.spark.sql.Column, tot: org.apache.spark.sql.Column) =
      floor(log((n + 1).cast("double") / (tot + DsirBuckets).cast("double")) *
        lit(1000000.0) + lit(0.5)).cast("long")
    val model = s.range(DsirBuckets).select(col("id").as("b"))
      .join(tgt, Seq("b"), "left").join(raw, Seq("b"), "left")
      .withColumn("ct", coalesce(col("ct"), lit(0L)))
      .withColumn("cr", coalesce(col("cr"), lit(0L)))
      .crossJoin(broadcast(tots))
      .select(col("b"),
        (lnMicro(col("ct"), col("tt")) - lnMicro(col("cr"), col("tr"))).as("llr_micro"))
    val docW = tb.filter(!isBench)
      .groupBy(col("doc_id"), col("source"), col("b")).agg(count(lit(1)).as("n"))
      .join(broadcast(model), "b")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("n") * col("llr_micro")).as("w_micro"))
      .persist()
    val perSource = docW.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum((col("w_micro") > 0).cast("long")).as("n_target_like"))
    val w = Window.partitionBy(col("source")).orderBy(col("w_micro").desc, col("doc_id"))
    docW.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= DsirTopK)
      .join(broadcast(perSource), "source")
      .select(col("source"), col("rnk").cast("long").as("rnk"), col("doc_id"),
        col("w_micro"), col("n_docs"), col("n_target_like"))
      .orderBy(col("source"), col("rnk"))
  }

  val q285Sql: String = {
    def lnMicro(n: String, tot: String) =
      s"CAST(FLOOR(LN(CAST($n + 1 AS DOUBLE) / CAST($tot + $DsirBuckets AS DOUBLE))" +
        s" * 1000000.0 + 0.5) AS BIGINT)"
    s"""WITH tk AS (
       |  SELECT doc_id, source, unnest(${tokensSql("text")}) AS tok FROM documents),
       |dict AS (SELECT tok,
       |    ((${polyHashSql("tok")} % $DsirBuckets) + $DsirBuckets) % $DsirBuckets AS b
       |  FROM (SELECT DISTINCT tok FROM tk)),
       |tb AS (SELECT doc_id, source, b FROM tk JOIN dict USING (tok)),
       |tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tb
       |        WHERE ((doc_id % ${Round8Ops.LshBenchMod}) + ${Round8Ops.LshBenchMod})
       |              % ${Round8Ops.LshBenchMod} = 0 GROUP BY b),
       |rw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tb
       |       WHERE ((doc_id % ${Round8Ops.LshBenchMod}) + ${Round8Ops.LshBenchMod})
       |             % ${Round8Ops.LshBenchMod} <> 0 GROUP BY b),
       |tots AS (SELECT (SELECT CAST(SUM(ct) AS BIGINT) FROM tgt) AS tt,
       |                (SELECT CAST(SUM(cr) AS BIGINT) FROM rw) AS tr),
       |model AS (
       |  SELECT dom.b,
       |         ${lnMicro("COALESCE(tgt.ct, 0)", "tots.tt")}
       |           - ${lnMicro("COALESCE(rw.cr, 0)", "tots.tr")} AS llr_micro
       |  FROM (SELECT unnest(range(0, $DsirBuckets)) AS b) dom
       |  LEFT JOIN tgt USING (b) LEFT JOIN rw USING (b) CROSS JOIN tots),
       |docw AS (
       |  SELECT doc_id, source, CAST(SUM(n * llr_micro) AS BIGINT) AS w_micro
       |  FROM (SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS n FROM tb
       |        WHERE ((doc_id % ${Round8Ops.LshBenchMod}) + ${Round8Ops.LshBenchMod})
       |              % ${Round8Ops.LshBenchMod} <> 0 GROUP BY doc_id, source, b)
       |  JOIN model USING (b) GROUP BY doc_id, source),
       |ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |              CAST(SUM(CASE WHEN w_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |                AS n_target_like
       |       FROM docw GROUP BY source),
       |ranked AS (
       |  SELECT source, doc_id, w_micro,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY w_micro DESC, doc_id) AS rnk
       |  FROM docw)
       |SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, w_micro, n_docs, n_target_like
       |FROM ranked JOIN ps USING (source)
       |WHERE rnk <= $DsirTopK
       |ORDER BY source, rnk""".stripMargin
  }

  /** Knuth mix for q286's uniform hash (distinct from q278/q279/q236's
    * so the sampling families decorrelate). */
  val GumbelMix = 2971215073L
  /** Kept sample size per source in q286. */
  val GumbelK = 10

  /** q286 — reproducible WEIGHTED sampling without replacement via
    * Gumbel-top-k (Efraimidis–Spirakis / Kool et al.): each document
    * draws a deterministic uniform u from a Knuth hash of its id,
    * perturbs its log-weight with the Gumbel quantile
    * g = −ln(−ln(u)), and the top-[[GumbelK]] keys per source ARE a
    * without-replacement sample with inclusion probability ∝ weight
    * (here: token count — sample proportional to length). q278 is the
    * uniform version of this; the Gumbel trick extends the same
    * engine/partitioning-independent determinism to WEIGHTED selection,
    * which true weighted reservoir sampling (traversal-order-dependent)
    * cannot give a reproducible pipeline.
    *
    * One scan → per-doc integer weight → one double expression → one
    * per-source top-k window (the q278/`smallest_k` scale note applies).
    * The Gumbel key is computed in ONE double chain and 6-dp
    * micro-rounded at the end (ties broken by doc_id), so both engines
    * rank identical integers; u is (hash + 0.5)/P — never 0 or 1, so
    * the nested logs are always finite. Zero-token docs carry weight
    * ln(1)=0 (u alone decides), keeping every doc sampleable. */
  def q286GumbelTopK(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("u",
        (pmod(pmod(col("doc_id"), lit(P)) * GumbelMix, lit(P)).cast("double") +
          lit(0.5)) / lit(P.toDouble))
      .withColumn("key_micro",
        floor((log(greatest(col("n_tok"), lit(1L)).cast("double")) -
          log(-log(col("u")))) * lit(1000000.0) + lit(0.5)).cast("long"))
    val tot = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tot_tok"))
    val w = Window.partitionBy(col("source")).orderBy(col("key_micro").desc, col("doc_id"))
    docs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= GumbelK)
      .join(broadcast(tot), "source")
      .select(col("source"), col("rnk").cast("long").as("rnk"), col("doc_id"),
        col("n_tok"), col("key_micro"), col("n_docs"), col("tot_tok"))
      .orderBy(col("source"), col("rnk"))
  }

  val q286Sql: String =
    s"""WITH docs AS (
       |  SELECT source, doc_id,
       |         CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tok,
       |         (CAST((((doc_id % $P) + $P) % $P) * $GumbelMix % $P AS DOUBLE) + 0.5)
       |           / CAST($P AS DOUBLE) AS u
       |  FROM documents),
       |keyed AS (
       |  SELECT source, doc_id, n_tok,
       |         CAST(FLOOR((LN(CAST(GREATEST(n_tok, 1) AS DOUBLE)) - LN(-LN(u)))
       |                * 1000000.0 + 0.5) AS BIGINT) AS key_micro
       |  FROM docs),
       |t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |             CAST(SUM(n_tok) AS BIGINT) AS tot_tok
       |      FROM docs GROUP BY source),
       |ranked AS (
       |  SELECT source, doc_id, n_tok, key_micro,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY key_micro DESC, doc_id) AS rnk
       |  FROM keyed)
       |SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, n_tok, key_micro,
       |       n_docs, tot_tok
       |FROM ranked JOIN t USING (source)
       |WHERE rnk <= $GumbelK
       |ORDER BY source, rnk""".stripMargin

  val queries: Map[String, Q] = Map(
    "q285_dsir_weights" -> q285DsirWeights _,
    "q286_gumbel_topk" -> q286GumbelTopK _)

  val oracles: Map[String, String] = Map(
    "q285_dsir_weights" -> q285Sql,
    "q286_gumbel_topk" -> q286Sql)
}
