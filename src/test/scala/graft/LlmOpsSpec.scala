package graft

import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LlmOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("polyHash matches the reference fold ((0*31+c1)*31+c2)... mod P") {
    import spark.implicits._
    val got = Seq("abc").toDF("s").select(Portable.polyHash(col("s"))).head().getLong(0)
    assert(got == (("abc".foldLeft(0L)((a, c) => (a * 31 + c) % Portable.P))))
    assert(got == 96354L) // cross-checked against the DuckDB mirror
  }

  test("cosine of a vector with itself is 1.0") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f, 3f))).toDF("a", "b")
    assert(df.select(Portable.cosine(col("a"), col("b"))).head().getDouble(0) == 1.0)
  }

  test("q35 minhash pairs are ordered, deduped, and above threshold") {
    val rows = operators.TextOps.q35MinHashLsh(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("da") < r.getAs[Long]("db")))
    assert(rows.forall(r => r.getAs[Double]("jac") >= 0.5 && r.getAs[Double]("jac") <= 1.0))
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
  }

  test("q55 dup clusters: ids are cluster minima and every q35 pair is co-clustered") {
    val labels = operators.TextOps.q55DupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(labels.nonEmpty)
    // the cluster id is the minimum member (canonical representative)
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
    }
    // connectivity: each verified near-dup pair lands in one cluster
    val pairs = operators.TextOps.q35MinHashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(labels(a) == labels(b)) }
    spark.catalog.clearCache()
  }

  test("q36 simhash is a 30-bit value") {
    val rows = operators.TextOps.q36SimHash(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val h = r.getAs[Long]("simhash"); h >= 0 && h < (1L << 30)
    })
  }

  test("q32 langid predicts a known language for every doc") {
    val langs = operators.TextOps.LangMarkers.map(_._1).toSet
    val rows = operators.TextOps.q32LangId(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(r => langs(r.getAs[String]("predicted"))))
  }

  test("q37 multi-probe blocking stays an equi-join and finds ordered pairs") {
    val df = operators.VectorOps.q37EmbedNearDup(spark, sf)
    // candidate generation must be a hash-joinable equi-join on the probe
    // bucket — never a cartesian / broadcast-NLJ over all pairs
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("va") < r.getAs[Long]("vb")))
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length) // one probe match per pair
  }

  test("q38 knn returns exactly 5 ranked neighbors per query vector") {
    val rows = operators.VectorOps.q38KnnBrute(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 8)
    assert(byQ.values.forall { rs =>
      rs.length == 5 && rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to 5)
    })
    // neighbors are in non-increasing cosine order
    assert(byQ.values.forall { rs =>
      val cs = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      cs.zip(cs.tail).forall { case (a, b) => a >= b }
    })
  }

  test("q39 IVF assignment partitions the non-centroid vectors") {
    val rows = operators.VectorOps.q39IvfAssign(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_assigned")).sum
    val nData = Tables.embeddings(spark, sf).filter(col("vec_id") >= 16).count()
    assert(total == nData)
  }
}
