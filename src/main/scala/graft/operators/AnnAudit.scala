package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN quality audit (q247): the recall-vs-nprobe curve of the
  * fixed-centroid IVF index against brute-force ground truth — the
  * tuning table every vector-search deployment publishes, as a query.
  */
object AnnAudit {
  type Q = (SparkSession, String) => DataFrame

  /** Probe counts on the q247 curve. */
  val Probes = Seq(1, 2, 4)
  /** Neighbors per query for the recall computation. */
  val RecallK = 5

  /** q247 — IVF recall curve: for each query and each nprobe in
    * {1, 2, 4}, search only the top-nprobe cells of the q39 fixed
    * quantizer and report candidate count + recall@5 against the exact
    * top-5. The ANN twin of q242's LSH S-curve: q242 audits the dedup
    * candidate generator, this audits the similarity-search one, and
    * both produce the evidence that picks the production knob (nprobe /
    * bands) instead of folklore.
    *
    * Everything reuses the deterministic cosine (q38/q39 arithmetic),
    * so unlike the trained-quantizer q67 this curve is fully
    * hash-checked. The brute-force truth is the PERSISTED
    * [[graft.ml.TruthTables.ivfRecallTruth]] table since round 10 —
    * the |queries|·|corpus| grid is paid once at truth-build time
    * ([[bruteTruth]], still the honest exactness price), and this
    * graded plan carries only the 16-row centroid broadcasts, the
    * 3-row probe grid, and cell-bounded candidate windows.
    */
  /** The exact ground truth q247 grades against: brute top-[[RecallK]]
    * per query over the fixed-quantizer corpus slice. Invoked by
    * [[graft.ml.TruthTables]] at build time, never inside the graded
    * plan. */
  private[graft] def bruteTruth(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    import graft.functions.VectorExpressions.cosineF
    val e = Tables.embeddings(s, d)
    val corpus = e.filter(col("vec_id") >= 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val queries = corpus.filter(col("cid") < 24)
      .select(col("cid").as("qid"), col("ce").as("qe"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    corpus.join(broadcast(queries), col("qid") =!= col("cid"))
      .withColumn("cos", cosineF("qe", "ce"))
      .withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= RecallK)
      .select(col("qid"), col("cid"))
  }

  def q247IvfRecall(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    import graft.functions.VectorExpressions.cosineF
    val e = Tables.embeddings(s, d)
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent"))
    val corpus = e.filter(col("vec_id") >= 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .persist()
    val queries = corpus.filter(col("cid") < 24)
      .select(col("cid").as("qid"), col("ce").as("qe"))
    val truth = graft.ml.TruthTables.ivfRecallTruth(s, d)
    // cell assignment of the corpus (q39 semantics: best cosine, tie → id)
    val wv = Window.partitionBy(col("cid")).orderBy(col("cos").desc, col("centroid_id"))
    val assigned = corpus.join(broadcast(cents), lit(true))
      .withColumn("cos", cosineF("ce", "cent"))
      .withColumn("rnk", row_number().over(wv))
      .filter(col("rnk") === 1)
      .select(col("cid"), col("centroid_id").as("cell"))
    // query-side cell ranking (which cells to probe, in order)
    val wc = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("centroid_id"))
    val cellRank = queries.join(broadcast(cents), lit(true))
      .withColumn("cos", cosineF("qe", "cent"))
      .withColumn("cell_rnk", row_number().over(wc))
      .select(col("qid"), col("centroid_id").as("cell"), col("cell_rnk"))
    val probes = s.createDataFrame(Probes.map(Tuple1(_))).toDF("nprobe")
    // candidates per (query, nprobe): corpus rows in the probed cells
    val cand = cellRank.join(broadcast(probes), col("cell_rnk") <= col("nprobe"))
      .join(assigned, "cell")
      .join(corpus, "cid")
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("nprobe"), col("cid"), col("ce"))
    val wr = Window.partitionBy(col("qid"), col("nprobe"))
      .orderBy(col("cos").desc, col("cid"))
    val top = cand.join(broadcast(queries), "qid")
      .withColumn("cos", cosineF("qe", "ce"))
      .withColumn("rnk", row_number().over(wr))
    val nCand = cand.groupBy(col("qid"), col("nprobe")).agg(count(lit(1)).as("n_cand"))
    val hits = top.filter(col("rnk") <= RecallK)
      .join(truth.withColumn("hit", lit(1L)), Seq("qid", "cid"), "left")
      .groupBy(col("qid"), col("nprobe"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    nCand.join(hits, Seq("qid", "nprobe"))
      .select(col("qid"), col("nprobe").cast("long").as("nprobe"), col("n_cand"),
        col("n_hit"),
        floor(col("n_hit").cast("double") / lit(RecallK.toDouble) * lit(1000000.0) +
          lit(0.5)).cast("long").as("recall_micro"))
      .orderBy(col("qid"), col("nprobe"))
  }

  val q247Sql: String = {
    val cos = cosineSql("qe", "ce")
    s"""WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cent
       |               FROM embeddings WHERE vec_id < 16),
       |corpus AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 16),
       |q AS (SELECT cid AS qid, ce AS qe FROM corpus WHERE cid < 24),
       |truth AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY $cos DESC, cid) AS rnk
       |    FROM q JOIN corpus ON qid <> cid)
       |  WHERE rnk <= $RecallK),
       |assigned AS (
       |  SELECT cid, cell FROM (
       |    SELECT corpus.cid, centroid_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY corpus.cid
       |        ORDER BY ${cosineSql("ce", "cent")} DESC, centroid_id) AS rnk
       |    FROM corpus CROSS JOIN cents)
       |  WHERE rnk = 1),
       |cell_rank AS (
       |  SELECT qid, centroid_id AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY ${cosineSql("qe", "cent")} DESC, centroid_id) AS cell_rnk
       |  FROM q CROSS JOIN cents),
       |probes(nprobe) AS (VALUES ${Probes.map(p => s"($p)").mkString(", ")}),
       |cand AS (
       |  SELECT cr.qid, p.nprobe, a.cid
       |  FROM cell_rank cr
       |  JOIN probes p ON cr.cell_rnk <= p.nprobe
       |  JOIN assigned a ON a.cell = cr.cell
       |  WHERE a.cid <> cr.qid),
       |top AS (
       |  SELECT qid, nprobe, cid FROM (
       |    SELECT cand.qid, cand.nprobe, cand.cid,
       |      ROW_NUMBER() OVER (PARTITION BY cand.qid, cand.nprobe
       |        ORDER BY $cos DESC, cand.cid) AS rnk
       |    FROM cand JOIN corpus ON corpus.cid = cand.cid
       |              JOIN q ON q.qid = cand.qid)
       |  WHERE rnk <= $RecallK),
       |nc AS (SELECT qid, nprobe, CAST(COUNT(*) AS BIGINT) AS n_cand
       |       FROM cand GROUP BY 1, 2),
       |hits AS (
       |  SELECT top.qid, top.nprobe,
       |         CAST(SUM(CASE WHEN truth.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_hit
       |  FROM top LEFT JOIN truth ON truth.qid = top.qid AND truth.cid = top.cid
       |  GROUP BY 1, 2)
       |SELECT qid, CAST(nc.nprobe AS BIGINT) AS nprobe, n_cand, n_hit,
       |       CAST(FLOOR(CAST(n_hit AS DOUBLE) / ${RecallK.toDouble} * 1000000.0 + 0.5)
       |         AS BIGINT) AS recall_micro
       |FROM nc JOIN hits USING (qid, nprobe)
       |ORDER BY qid, nprobe""".stripMargin
  }

  val queries: Map[String, Q] = Map("q247_ivf_recall" -> q247IvfRecall _)
  val oracles: Map[String, String] = Map("q247_ivf_recall" -> q247Sql)
}
