package graft

import graft.ml.KMeansIvf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  import TestSpark._

  test("k-means: inertia is non-increasing and assignment partitions the data") {
    val e = Tables.embeddings(spark, sf)
    val (centroids, inertias) = KMeansIvf.fit(e, "vec_id", "embedding", k = 4, iters = 3)
    assert(centroids.count() == 4)
    assert(inertias.length == 3)
    assert(inertias.zip(inertias.tail).forall { case (a, b) => b <= a + 1e-6 },
      s"inertia not non-increasing: $inertias")
    val assigned = KMeansIvf.assign(e, centroids, "vec_id", "embedding")
    assert(assigned.count() == e.count())
    assert(assigned.select(countDistinct(col("cluster"))).head().getLong(0) <= 4)
    // refit with same inputs is bit-identical (deterministic training)
    val (c2, i2) = KMeansIvf.fit(e, "vec_id", "embedding", k = 4, iters = 3)
    assert(i2 == inertias)
    val a = centroids.orderBy("cluster").collect().map(_.toString)
    val b = c2.orderBy("cluster").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("q148 IVF assignment: one cell per vector, rounded model, distances finite") {
    val rows = graft.operators.VectorOps.q148IvfAssign(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length == n) // exactly one cell per vector
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == n)
    val clusters = rows.map(_.getAs[Long]("cluster")).toSet
    assert(clusters.subsetOf((0L until 8L).toSet))
    assert(rows.forall(r => r.getAs[Double]("dist6") >= 0.0))
    spark.catalog.clearCache()
  }
}
