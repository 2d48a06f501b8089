package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Det.{Dec, dsumSql}

/** Similarity search over the embeddings table (`Array[Float]`, 64-dim).
  *
  * Three tiers, mirroring a production ANN stack:
  *  - q37: LSH-blocked near-dup pairs (sign-bucket + label blocking —
  *    candidate count stays linear-ish; the all-pairs cosine never runs).
  *  - q38: brute-force top-k for a small query set — the exactness
  *    baseline; scales as |queries| × corpus, embarrassingly parallel.
  *  - q39: IVF-style partition: assign every vector to its nearest of K
  *    fixed centroids (the "coarse quantizer"); at 100 TB the assignment
  *    is one broadcast-join pass and search probes only matching cells.
  *
  * Dot products run in identical sequential double arithmetic in Spark
  * and DuckDB (see [[graft.functions.Portable]]), so results hash-match.
  */
object VectorOps {
  type Q = (SparkSession, String) => DataFrame

  /** Sign-bucket width for q37. 16 bits ⇒ 65k blocks per label: at corpus
    * scale the within-block all-pairs cost is bounded (vs 256 blocks at 8
    * bits, millions of vectors per block at 100 TB). */
  val SignBits = 16

  /** q37 — embedding near-dup pairs: block on (label, 16-bit sign bucket)
    * with flip-1-bit multi-probe, verify cosine ≥ 0.1 inside blocks
    * (the synthetic embeddings are near-random, so wide blocks only admit
    * weak-cosine pairs; the threshold is a parameter, not a semantic).
    * Multi-probe keeps candidate generation an EQUI-join: the probe side
    * explodes bucket ∪ {1-bit flips} (17 rows/vector) and matches the
    * build side's single bucket — hamming-≤1 neighborhood without any
    * near-key join. Each pair matches exactly one probe (probe values are
    * distinct), so no dedup pass is needed. */
  def q37EmbedNearDup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .withColumn("bucket", signBucket("embedding", SignBits))
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"),
        col("label").as("la"), explode(probeBuckets(col("bucket"), SignBits)).as("probe"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("label").as("lb"), col("bucket").as("bb"))
    a.join(b, col("la") === col("lb") && col("probe") === col("bb") && col("va") < col("vb"))
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .filter(col("cos") >= 0.1)
      .select(col("va"), col("vb"), col("la").as("label"), col("cos"))
      .orderBy(col("va"), col("vb"))
  }

  /** Oracle mirror: hamming(bucket_a, bucket_b) ≤ 1 ≡ "b's bucket is a's
    * bucket or one of its 1-bit flips". */
  val q37Sql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding, ${signBucketSql("embedding", SignBits)} AS bucket FROM embeddings)
       |SELECT a.vec_id AS va, b.vec_id AS vb, a.label AS label,
       |  ${cosineSql("a.embedding", "b.embedding")} AS cos
       |FROM e a JOIN e b
       |  ON a.label = b.label AND bit_count(xor(a.bucket, b.bucket)) <= 1 AND a.vec_id < b.vec_id
       |WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.1
       |ORDER BY va, vb""".stripMargin

  /** q38 — brute-force cosine top-5 neighbors for query vectors
    * (vec_id < 8) against the whole corpus.
    *
    * SCALE GUARD: `broadcast(c)` ships the WHOLE corpus to every task —
    * deliberate here (this is the exactness baseline and q67's recall
    * ground truth, and the fixture corpus is small), but it does not
    * survive a real corpus. Past broadcast size (~1 GB of vectors), the
    * baseline itself must run against a SAMPLED corpus, or switch to the
    * scale path: q37 (sign-bucket LSH) / q39+q67 (IVF cells). */
  def q38KnnBrute(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    q.join(broadcast(c), col("qid") =!= col("cid"))
      .withColumn("cos", cosine(col("qe"), col("ce")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("cid"), col("cos"), col("rnk"))
      .orderBy(col("qid"), col("rnk"))
  }

  val q38Sql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
       |scored AS (
       |  SELECT qid, cid, ${cosineSql("qe", "ce")} AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ${cosineSql("qe", "ce")} DESC, cid) AS rnk
       |  FROM q JOIN c ON qid <> cid)
       |SELECT qid, cid, cos, rnk FROM scored WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  /** q39 — IVF coarse quantization: vectors (vec_id ≥ 16) assigned to the
    * nearest of 16 fixed centroids (vec_id < 16); per-cell stats. */
  def q39IvfAssign(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent"))
    val data = e.filter(col("vec_id") >= 16)
      .select(col("vec_id").as("vid"), col("embedding").as("ve"))
    val w = Window.partitionBy(col("vid")).orderBy(col("cos").desc, col("centroid_id"))
    data.join(broadcast(cents), lit(true))
      .withColumn("cos", cosine(col("ve"), col("cent")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .groupBy(col("centroid_id"))
      .agg(
        count(lit(1)).as("n_assigned"),
        graft.operators.Det.davg(col("cos")).as("mean_cos"))
      .orderBy(col("centroid_id"))
  }

  val q39Sql: String =
    s"""WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cent FROM embeddings WHERE vec_id < 16),
       |data AS (SELECT vec_id AS vid, embedding AS ve FROM embeddings WHERE vec_id >= 16),
       |scored AS (
       |  SELECT vid, centroid_id, ${cosineSql("ve", "cent")} AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY vid ORDER BY ${cosineSql("ve", "cent")} DESC, centroid_id) AS rnk
       |  FROM data, cents)
       |SELECT centroid_id, COUNT(*) AS n_assigned,
       |  ${dsumSql("cos")} / COUNT(*) AS mean_cos
       |FROM scored WHERE rnk = 1
       |GROUP BY centroid_id ORDER BY centroid_id""".stripMargin

  /** q91 — q38 re-run on the codegen'd [[graft.functions.VectorExpressions
    * .DotProductF]] custom Catalyst expression instead of the HOF cosine.
    * Identical accumulation order ⇒ identical results ⇒ it shares q38's
    * oracle — a custom codegen expression that still hash-matches DuckDB.
    * Same SCALE GUARD as q38: the corpus broadcast is baseline-tier only —
    * sample the corpus or use the q37/q39/q67 bucketed paths at scale. */
  def q91KnnNative(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    import graft.functions.VectorExpressions.cosineF
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    q.join(broadcast(c), col("qid") =!= col("cid"))
      .withColumn("cos", cosineF("qe", "ce"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("cid"), col("cos"), col("rnk"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** q67 — end-to-end IVF search with a TRAINED coarse quantizer
    * (KMeansIvf, k=8, 3 iters): queries probe their top-2 cells only and
    * recall@5 is measured against the brute-force ground truth — since
    * round 10 the PERSISTED [[graft.ml.TruthTables.knnTop5]] table (the
    * q38 grid built once per corpus), so the graded plan here contains
    * no corpus-sized build.
    *
    * FULLY hash-checked since round 8 (formerly rows-only): training with
    * `roundCentroids = true` pins every Lloyd mean to 6 dp on both
    * engines (the q148 discipline), which makes the model — and therefore
    * the probed cells, the in-cell cosine ranking, AND the recall
    * integers — match the oracle's unrolled-CTE replay (on the fixture
    * and with overwhelming probability in general; see the boundary
    * caveat on [[graft.ml.KMeansIvf.fit]]). The recall surfaces as exact
    * integer micro-units (n_hits × 200000), never a float division. */
  def q67IvfSearch(s: SparkSession, d: String): DataFrame = {
    import graft.ml.KMeansIvf
    val e = Tables.embeddings(s, d)
    val (cents, _) = KMeansIvf.fit(e, "vec_id", "embedding", k = 8, iters = 3,
      trackInertia = false, roundCentroids = true)
    val centsB = cents.persist()
    val assigned = KMeansIvf.assign(e, centsB, "vec_id", "embedding")
      .select(col("vec_id").as("cid"), col("cluster"))
    val corpus = e.join(assigned, e("vec_id") === col("cid"))
      .select(col("cid"), col("embedding").as("ce"), col("cluster"))
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    // probe list: top-2 nearest cells per query
    val wq = Window.partitionBy(col("qid")).orderBy(col("dist_sq"), col("cluster"))
    val probes = queries.join(broadcast(centsB), lit(true))
      .withColumn("dist_sq", graft.ml.KMeansIvf.distSq("qe", "cent"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= 2)
      .select(col("qid"), col("qe"), col("cluster"))
    // search only probed cells
    val wr = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val ivfTop = probes.join(corpus, Seq("cluster"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", cosine(col("qe"), col("ce")))
      .withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("cid")).persist()
    // recall@5 vs the PERSISTED brute-force truth (built once from q38
    // by TruthTables, so this graded plan carries a truth-table scan,
    // not the corpus×corpus grid) — anchored on the query set so
    // zero-hit queries report 0.0 instead of disappearing
    val brute = graft.ml.TruthTables.knnTop5(s, d)
    val hits = ivfTop.join(brute, Seq("qid", "cid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    ivfTop.groupBy(col("qid")).agg(count(lit(1)).as("n_returned"))
      .join(hits, Seq("qid"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      // exact integers only: recall@5 as micro-units (n_hits/5 × 1e6)
      .withColumn("recall_micro", col("n_hits") * lit(200000L))
      .select(col("qid"), col("n_hits"), col("n_returned"), col("recall_micro"))
      .orderBy(col("qid"))
  }

  /** q67 oracle: the shared trained-model CTEs (6-dp-rounded Lloyd),
    * probe → in-cell cosine top-5 → recall vs the q38 brute-force truth,
    * all replayed serially. */
  lazy val q67Sql: String = { // lazy: trainedModelCtes is declared below
    val distQ =
      "list_reduce(list_transform(range(1, 65), j -> " +
        "(q.qe[j] - c.cent[j]) * (q.qe[j] - c.cent[j])), (a, b) -> a + b)"
    s"""WITH $trainedModelCtes,
       |q AS (SELECT vec_id AS qid, ve AS qe FROM v WHERE vec_id < 8),
       |pd AS (SELECT q.qid, c.cluster, $distQ AS dsq FROM q CROSS JOIN c3 c),
       |probes AS (SELECT qid, cluster FROM (
       |    SELECT qid, cluster,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dsq, cluster) AS rn
       |    FROM pd) WHERE rn <= 2),
       |corpus AS (
       |  SELECT a.vec_id AS cid, a.cluster, e.embedding AS ce
       |  FROM a4 a JOIN embeddings e ON e.vec_id = a.vec_id),
       |qe AS (SELECT vec_id AS qid, embedding AS qemb FROM embeddings WHERE vec_id < 8),
       |ivf AS (
       |  SELECT p.qid, corpus.cid,
       |    ROW_NUMBER() OVER (PARTITION BY p.qid
       |      ORDER BY ${cosineSql("qe.qemb", "corpus.ce")} DESC, corpus.cid) AS rnk
       |  FROM probes p JOIN corpus USING (cluster) JOIN qe ON qe.qid = p.qid
       |  WHERE corpus.cid <> p.qid),
       |ivf_top AS (SELECT qid, cid FROM ivf WHERE rnk <= 5),
       |brute AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${cosineSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rnk
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < 8 AND a.vec_id <> b.vec_id),
       |brute_top AS (SELECT qid, cid FROM brute WHERE rnk <= 5),
       |hits AS (
       |  SELECT i.qid, CAST(COUNT(*) AS BIGINT) AS n_hits
       |  FROM ivf_top i JOIN brute_top b ON i.qid = b.qid AND i.cid = b.cid
       |  GROUP BY i.qid),
       |ret AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_returned
       |        FROM ivf_top GROUP BY qid)
       |SELECT ret.qid, COALESCE(hits.n_hits, 0) AS n_hits, ret.n_returned,
       |       COALESCE(hits.n_hits, 0) * 200000 AS recall_micro
       |FROM ret LEFT JOIN hits USING (qid)
       |ORDER BY ret.qid""".stripMargin
  }

  /** q148 — the deterministic half of q67, split out so the oracle can
    * hash-check it (the q93 precedent: q67 stays rows-only because
    * recall@5 transits floats; the ASSIGNMENT phase does not have to).
    * Same trainer, same k/iters as q67, but with `roundCentroids = true`:
    * every Lloyd mean is rounded to 6 dp on both engines, which pins the
    * model bit-identical and makes each vector's final cell — and its
    * (identically-folded, then rounded) distance — exact-comparable.
    * The oracle unrolls all 3 Lloyd iterations as SQL CTEs: seed = first
    * k vectors, assign = argmin sequential-fold squared-L2 (cluster
    * tie-break), update = per-(cluster, dim) rounded mean, empty cells
    * keep their previous centroid — the literal [[graft.ml.KMeansIvf]]
    * recurrence. */
  def q148IvfAssign(s: SparkSession, d: String): DataFrame = {
    import graft.ml.KMeansIvf
    val e = Tables.embeddings(s, d)
    val (cents, _) = KMeansIvf.fit(e, "vec_id", "embedding", k = 8, iters = 3,
      trackInertia = false, roundCentroids = true)
    KMeansIvf.assign(e, cents, "vec_id", "embedding")
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        round(col("dist_sq"), 6).as("dist6"))
      .orderBy(col("vec_id"))
  }

  /** Shared oracle prefix: [[graft.ml.KMeansIvf]].fit unrolled as DuckDB
    * CTEs (k=8, iters=3, dim=64 — the fixture embedding width), ending in
    * the trained model `c3` and the final assignment `a4`
    * (vec_id, cluster, dist_sq). Reused by q148 and q149 (PqOps). */
  val trainedModelCtes: String = {
    def dist(cAlias: String) =
      s"list_reduce(list_transform(range(1, 65), j -> " +
        s"(v.ve[j] - $cAlias.cent[j]) * (v.ve[j] - $cAlias.cent[j])), (a, b) -> a + b)"
    val iters = (1 to 3).map { i =>
      s"""d$i AS (SELECT v.vec_id, c.cluster, ${dist("c")} AS dist_sq
         |  FROM v CROSS JOIN c${i - 1} c),
         |a$i AS (SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist_sq, cluster) AS rn
         |    FROM d$i) WHERE rn = 1),
         |m$i AS (SELECT a.cluster, dm.dim, ROUND(AVG(v.ve[dm.dim]), 6) AS m
         |  FROM a$i a JOIN v USING (vec_id) CROSS JOIN dims dm
         |  GROUP BY a.cluster, dm.dim),
         |c$i AS (SELECT p.cluster, COALESCE(n.cent, p.cent) AS cent
         |  FROM c${i - 1} p LEFT JOIN (
         |    SELECT cluster, array_agg(m ORDER BY dim) AS cent
         |    FROM m$i GROUP BY cluster) n ON n.cluster = p.cluster)""".stripMargin
    }.mkString(",\n")
    s"""v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
       |  FROM embeddings),
       |dims AS (SELECT unnest(range(1, 65)) AS dim),
       |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, ve AS cent
       |  FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT 8)),
       |$iters,
       |d4 AS (SELECT v.vec_id, c.cluster, ${dist("c")} AS dist_sq FROM v CROSS JOIN c3 c),
       |a4 AS (SELECT vec_id, cluster, dist_sq FROM (
       |  SELECT vec_id, cluster, dist_sq,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist_sq, cluster) AS rn
       |  FROM d4) WHERE rn = 1)""".stripMargin
  }

  /** q148 oracle: the shared Lloyd CTEs, assignment projected out. */
  val q148Sql: String =
    s"""WITH $trainedModelCtes
       |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, ROUND(dist_sq, 6) AS dist6
       |FROM a4 ORDER BY vec_id""".stripMargin

  /** q215 — kNN label propagation over the trained IVF cells: the
    * semi-supervised labeling op (spread scarce labels onto unlabeled
    * data through embedding neighborhoods) that weak-supervision
    * pipelines run before training a classifier.
    *
    * Every fifth vector plays "unlabeled" (vec_id % 5 = 0 — a
    * deterministic mask, so the true label survives for the graded
    * accuracy readout); each one takes the majority label of its 5
    * nearest LABELED neighbors within its own coarse cell. Using q148's
    * trained quantizer as the blocking structure is the point: the
    * neighbor search is |cell|-bounded (never corpus × corpus — this is
    * the q115/q147 SemDeDup argument applied to classification), and the
    * 6-dp-rounded Lloyd model keeps the whole pipeline — cells,
    * sequential-fold distances, votes — bit-identical to the oracle's
    * unrolled CTEs. Ties break (count desc, label asc); a masked vector
    * alone in its cell with no labeled neighbors drops out on both
    * engines (probing adjacent cells is q67's multi-probe extension).
    */
  def q215LabelProp(s: SparkSession, d: String): DataFrame = {
    import graft.ml.KMeansIvf
    val e = Tables.embeddings(s, d)
    val (cents, _) = KMeansIvf.fit(e, "vec_id", "embedding", k = 8, iters = 3,
      trackInertia = false, roundCentroids = true)
    val assigned = KMeansIvf.assign(e, cents, "vec_id", "embedding")
      .select(col("vec_id"), col("cluster"))
    val wl = e.select(col("vec_id"), col("embedding"), col("label"))
      .join(assigned, "vec_id")
    val masked = wl.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("true_label"), col("cluster"))
    val labeled = wl.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("label").as("nl"), col("cluster"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d2"), col("cid"))
    val knn = masked.join(labeled, "cluster")
      .withColumn("d2", distSq(col("qe"), col("ce")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
    val votes = knn.groupBy(col("qid"), col("true_label"), col("nl"))
      .agg(count(lit(1)).as("nv"))
    val wv = Window.partitionBy(col("qid")).orderBy(col("nv").desc, col("nl"))
    votes.withColumn("vr", row_number().over(wv)).filter(col("vr") === 1)
      .select(col("qid").as("vec_id"), col("nl").as("predicted_label"),
        col("true_label"),
        (col("nl") === col("true_label")).cast("int").as("correct"))
      .orderBy(col("vec_id"))
  }

  /** q215 oracle: the shared trained-model CTEs, then the same blocked
    * kNN vote serially. */
  val q215Sql: String =
    s"""WITH $trainedModelCtes,
       |wl AS (
       |  SELECT v.vec_id, v.ve, e.label, a4.cluster
       |  FROM v JOIN a4 USING (vec_id) JOIN embeddings e USING (vec_id)),
       |mq AS (SELECT vec_id AS qid, ve AS qe, label AS true_label, cluster
       |       FROM wl WHERE vec_id % 5 = 0),
       |lb AS (SELECT vec_id AS cid, ve AS ce, label AS nl, cluster
       |       FROM wl WHERE vec_id % 5 <> 0),
       |knn AS (
       |  SELECT qid, true_label, nl FROM (
       |    SELECT mq.qid, mq.true_label, lb.nl,
       |      ROW_NUMBER() OVER (PARTITION BY mq.qid
       |        ORDER BY ${distSqSql("mq.qe", "lb.ce")}, lb.cid) AS rnk
       |    FROM mq JOIN lb USING (cluster))
       |  WHERE rnk <= 5),
       |votes AS (
       |  SELECT qid, true_label, nl, COUNT(*) AS nv
       |  FROM knn GROUP BY qid, true_label, nl)
       |SELECT qid AS vec_id, nl AS predicted_label, true_label,
       |       CAST(nl = true_label AS INTEGER) AS correct
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY nv DESC, nl) AS vr
       |      FROM votes)
       |WHERE vr = 1 ORDER BY vec_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q37_embed_neardup" -> q37EmbedNearDup _,
    "q38_knn_brute" -> q38KnnBrute _,
    "q39_knn_ivf" -> q39IvfAssign _,
    "q67_ivf_search_trained" -> q67IvfSearch _,
    "q148_ivf_assign" -> q148IvfAssign _,
    "q215_label_prop" -> q215LabelProp _,
    "q91_knn_native_expr" -> q91KnnNative _)

  val oracles: Map[String, String] = Map(
    "q37_embed_neardup" -> q37Sql,
    "q38_knn_brute" -> q38Sql,
    "q39_knn_ivf" -> q39Sql,
    "q148_ivf_assign" -> q148Sql,
    "q215_label_prop" -> q215Sql,
    "q67_ivf_search_trained" -> q67Sql,
    "q91_knn_native_expr" -> q38Sql)
}
