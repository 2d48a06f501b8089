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

  /** Data-loader shards and shuffled epochs for q287. */
  val OrderShards = 8
  val OrderEpochs = 3
  /** Per-epoch permutation mixes: distinct odd Knuth constants so the
    * three epoch orders decorrelate (graded by the head-overlap stat). */
  val EpochMixes: Seq[Long] = Seq(2654435761L, 2246822519L, 3266489917L)
  /** Reported head positions per (epoch, shard). */
  val OrderHeadK = 3

  /** q287 — reproducible epoch data-order plan (the Pythia/OLMo
    * training-reproducibility contract: anyone with the corpus and the
    * seed can name the exact document at any global step of any epoch):
    * every document is sharded by a doc-id hash and, PER EPOCH, ordered
    * inside its shard by an epoch-seeded Knuth hash — three independent
    * permutations from one scan (epoch explode), no RNG state anywhere,
    * so the order is identical on any engine, partitioning, or restart.
    *
    * Graded output per (epoch, shard): the shard population, the first
    * [[OrderHeadK]] documents of the epoch's order (the rows a resumed
    * job at step 0 must read), and the cross-epoch head-overlap count —
    * how many of THIS epoch's head-[[GumbelK]] docs are also in epoch
    * 0's head — an actual decorrelation measurement (≈ hypergeometric
    * noise when the mixes are independent, |head| when a mix is
    * duplicated; epoch 0 reports its own overlap, = GumbelK, as the
    * built-in sanity anchor).
    *
    * One scan → explode(epochs) → per-(epoch, shard) rank windows
    * (partitions are the epoch×shard grid; the q278 `smallest_k` swap
    * applies at scale). All integer. */
  def q287EpochOrder(s: SparkSession, d: String): DataFrame = {
    val mixes = map(EpochMixes.zipWithIndex.flatMap {
      case (m, i) => Seq(lit(i), lit(m))
    }: _*)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), pmod(pmod(col("doc_id"), lit(P)) * EpochMixes.head, lit(P))
        .as("shard_h"))
      .withColumn("shard", pmod(col("shard_h"), lit(OrderShards)))
      .withColumn("epoch", explode(array((0 until OrderEpochs).map(lit): _*)))
      .withColumn("ok", pmod(pmod(col("doc_id"), lit(P)) * element_at(mixes, col("epoch")),
        lit(P)))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("ok"), col("doc_id"))
    val pos = docs.withColumn("pos", row_number().over(w)).persist()
    val heads = pos.filter(col("pos") <= GumbelK)
      .select(col("epoch"), col("shard"), col("doc_id"), col("pos"))
    val base = heads.filter(col("epoch") === 0)
      .select(col("shard").as("bshard"), col("doc_id").as("bdoc"))
    val overlap = heads.join(broadcast(base),
        col("shard") === col("bshard") && col("doc_id") === col("bdoc"), "left_semi")
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_head_overlap_e0"))
    val counts = pos.filter(col("epoch") === 0)
      .groupBy(col("shard")).agg(count(lit(1)).as("n_in_shard"))
    heads.filter(col("pos") <= OrderHeadK)
      .join(broadcast(counts), "shard")
      .join(broadcast(overlap), Seq("epoch", "shard"), "left")
      .select(col("epoch").cast("long").as("epoch"), col("shard"),
        col("pos").cast("long").as("pos"), col("doc_id"), col("n_in_shard"),
        coalesce(col("n_head_overlap_e0"), lit(0L)).as("n_head_overlap_e0"))
      .orderBy(col("epoch"), col("shard"), col("pos"))
  }

  val q287Sql: String = {
    val mixCase = EpochMixes.zipWithIndex
      .map { case (m, i) => s"WHEN $i THEN $m" }.mkString(" ")
    s"""WITH sharded AS (
       |  SELECT doc_id,
       |         ((((doc_id % $P) + $P) % $P) * ${EpochMixes.head} % $P) % $OrderShards
       |           AS shard
       |  FROM documents),
       |ordered AS (
       |  SELECT doc_id, shard, e.epoch,
       |         (((doc_id % $P) + $P) % $P)
       |           * (CASE e.epoch $mixCase END) % $P AS ok
       |  FROM sharded, (SELECT unnest(range(0, $OrderEpochs)) AS epoch) e),
       |pos AS (
       |  SELECT doc_id, shard, epoch,
       |    ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY ok, doc_id) AS pos
       |  FROM ordered),
       |heads AS (SELECT epoch, shard, doc_id, pos FROM pos WHERE pos <= $GumbelK),
       |ov AS (
       |  SELECT h.epoch, h.shard, CAST(COUNT(*) AS BIGINT) AS n_head_overlap_e0
       |  FROM heads h
       |  WHERE EXISTS (SELECT 1 FROM heads b
       |                WHERE b.epoch = 0 AND b.shard = h.shard AND b.doc_id = h.doc_id)
       |  GROUP BY h.epoch, h.shard),
       |cnt AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_in_shard
       |        FROM pos WHERE epoch = 0 GROUP BY shard)
       |SELECT CAST(h.epoch AS BIGINT) AS epoch, h.shard,
       |       CAST(h.pos AS BIGINT) AS pos, h.doc_id, cnt.n_in_shard,
       |       COALESCE(ov.n_head_overlap_e0, 0) AS n_head_overlap_e0
       |FROM heads h JOIN cnt USING (shard)
       |LEFT JOIN ov ON ov.epoch = h.epoch AND ov.shard = h.shard
       |WHERE h.pos <= $OrderHeadK
       |ORDER BY h.epoch, h.shard, h.pos""".stripMargin
  }

  /** Reported widest-margin pairs in q288. */
  val PrefTopK = 10

  /** q288 — implicit-feedback preference-pair mining (the BPR/DPO data
    * prep: from each user's same-day activity, the highest-valued event
    * is `chosen`, the lowest `rejected`, and the pair trains a pairwise
    * ranker). Pairs exist only where a real preference does: days with
    * ≥ 2 events and a strictly positive value margin. Values
    * micro-quantize (the Det float discipline) so margins are exact
    * BIGINTs.
    *
    * Graded output: the [[PrefTopK]] widest-margin pairs (global
    * top-k — TakeOrderedAndProject-shaped, never a global window) with
    * the per-day global pair/user accounting cross-joined from a 1-row
    * aggregate. One scan → per-(user, day) min/max aggregate → top-k. */
  def q288PreferencePairs(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_id"),
        floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("v_micro"))
    val pairs = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("v_micro"), (-col("event_id")).as("nid"))).as("hi"),
        min(struct(col("v_micro"), col("event_id").as("nid"))).as("lo"))
      .filter(col("n_events") >= 2)
      .select(col("user_id"), col("day"), col("n_events"),
        (-col("hi.nid")).as("chosen_id"), col("hi.v_micro").as("chosen_micro"),
        col("lo.nid").as("rejected_id"), col("lo.v_micro").as("rejected_micro"))
      .withColumn("margin_micro", col("chosen_micro") - col("rejected_micro"))
      .filter(col("margin_micro") > 0)
      .persist()
    val tot = pairs.agg(count(lit(1)).as("n_pairs"),
      countDistinct(col("user_id")).as("n_users"))
    pairs.orderBy(col("margin_micro").desc, col("user_id"), col("day")).limit(PrefTopK)
      .crossJoin(broadcast(tot))
      .withColumn("rnk", row_number().over(Window.partitionBy(lit(1))
        .orderBy(col("margin_micro").desc, col("user_id"), col("day"))))
      .select(col("rnk").cast("long").as("rnk"), col("user_id"), col("day"),
        col("chosen_id"), col("rejected_id"), col("margin_micro"),
        col("n_events"), col("n_pairs"), col("n_users"))
      .orderBy(col("rnk"))
  }

  val q288Sql: String =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, event_id,
       |         CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS v_micro
       |  FROM events),
       |hi AS (
       |  SELECT user_id, day, event_id AS chosen_id, v_micro AS chosen_micro,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, day
       |                       ORDER BY v_micro DESC, event_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY user_id, day) AS BIGINT) AS n_events
       |  FROM ev),
       |lo AS (
       |  SELECT user_id, day, event_id AS rejected_id, v_micro AS rejected_micro,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, day
       |                       ORDER BY v_micro ASC, event_id) AS rn
       |  FROM ev),
       |pairs AS (
       |  SELECT h.user_id, h.day, h.n_events, h.chosen_id, h.chosen_micro,
       |         l.rejected_id, l.rejected_micro,
       |         h.chosen_micro - l.rejected_micro AS margin_micro
       |  FROM (SELECT * FROM hi WHERE rn = 1) h
       |  JOIN (SELECT * FROM lo WHERE rn = 1) l
       |    ON h.user_id = l.user_id AND h.day = l.day
       |  WHERE h.n_events >= 2 AND h.chosen_micro - l.rejected_micro > 0),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM pairs),
       |ranked AS (
       |  SELECT user_id, day, n_events, chosen_id, rejected_id, margin_micro,
       |    ROW_NUMBER() OVER (ORDER BY margin_micro DESC, user_id, day) AS rnk
       |  FROM pairs)
       |SELECT CAST(rnk AS BIGINT) AS rnk, user_id, day, chosen_id, rejected_id,
       |       margin_micro, n_events, n_pairs, n_users
       |FROM ranked CROSS JOIN tot
       |WHERE rnk <= $PrefTopK
       |ORDER BY rnk""".stripMargin

  val queries: Map[String, Q] = Map(
    "q285_dsir_weights" -> q285DsirWeights _,
    "q286_gumbel_topk" -> q286GumbelTopK _,
    "q287_epoch_order" -> q287EpochOrder _,
    "q288_preference_pairs" -> q288PreferencePairs _)

  val oracles: Map[String, String] = Map(
    "q285_dsir_weights" -> q285Sql,
    "q286_gumbel_topk" -> q286Sql,
    "q287_epoch_order" -> q287Sql,
    "q288_preference_pairs" -> q288Sql)
}
