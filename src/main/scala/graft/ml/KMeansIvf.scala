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

  /** Squared L2 distance between a float-array column and a broadcast
    * double-array literal column, accumulated left-to-right. */
  private def distSq(vec: String, cent: String) = expr(
    s"aggregate(zip_with($vec, $cent, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0D, (a, v) -> a + v)")

  /** Assign every vector to its nearest centroid. `centroids` must be
    * small (it is broadcast). Returns (id, cluster, dist_sq). */
  def assign(data: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("dist_sq"), col("cluster"))
    data.join(broadcast(centroids), lit(true))
      .withColumn("dist_sq", distSq(vecCol, "cent"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cluster"), col("dist_sq"))
  }

  /** Train k centroids with `iters` Lloyd iterations. Returns the centroid
    * table (cluster, cent: array<double>) plus per-iteration inertia. */
  def fit(data: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): (DataFrame, Seq[Double]) = {
    val spark = data.sparkSession
    var centroids = data.orderBy(col(idCol)).limit(k)
      .select((row_number().over(Window.orderBy(col(idCol))) - 1).as("cluster"),
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("cent"))
    var inertias = List.empty[Double]
    for (_ <- 1 to iters) {
      val assigned = assign(data, centroids, idCol, vecCol)
      inertias ::= assigned.agg(sum(col("dist_sq"))).head().getDouble(0)
      // new centroid = per-dimension mean of members
      val members = data.join(assigned.select(col(idCol), col("cluster")), idCol)
      centroids = members
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .select(col("cluster"), expr("transform(dims, d -> d.m)").as("cent"))
    }
    (centroids, inertias.reverse)
  }
}
