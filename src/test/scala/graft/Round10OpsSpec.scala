package graft

import graft.operators.{GovernanceOps, Round10Ops, Round9Ops}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round10OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q305: the persisted index content is complete and internally consistent") {
    val rows = Round10Ops.q305HybridIndexBuild(spark, sf).collect()
    val byPart = rows.groupBy(_.getAs[String]("part"))
    // 8 centroids × 64 dims, every dim exactly once per cluster
    val cents = byPart("centroid")
    assert(cents.length == operators.RankOps.HybridK * 64)
    assert(cents.map(r => (r.getAs[Long]("id"), r.getAs[Long]("k"))).distinct.length ==
      cents.length)
    // centroid micros match the collected model the consumers embed
    val model = ml.HybridIndex.model(spark, sf)
    cents.foreach { r =>
      val want = math.floor(model(r.getAs[Long]("id").toInt)(r.getAs[Long]("k").toInt - 1) *
        1e6 + 0.5).toLong
      assert(r.getAs[Long]("v") == want)
    }
    // every corpus vector assigned exactly once, to a live cell
    val asg = byPart("assign")
    assert(asg.length == Tables.embeddings(spark, sf).count())
    assert(asg.map(_.getAs[Long]("id")).distinct.length == asg.length)
    asg.foreach(r => assert(r.getAs[Long]("v") >= 0 &&
      r.getAs[Long]("v") < operators.RankOps.HybridK))
    // 8 signatures per indexed doc
    val sigs = byPart("sig")
    assert(sigs.length % 8 == 0)
    assert(sigs.groupBy(_.getAs[Long]("id")).forall(_._2.length == 8))
  }

  test("q305 serve path: consumers read the index, and ensure() is build-once") {
    val d1 = ml.HybridIndex.ensure(spark, sf)
    val d2 = ml.HybridIndex.ensure(spark, sf)
    assert(d1 == d2)
    // the serve-side assignment equals a fresh literal-argmin recompute
    val model = ml.HybridIndex.model(spark, sf)
    def dists(vec: org.apache.spark.sql.Column) =
      array(model.map(c => call_function("dist_sq_a", vec, array(c.map(lit): _*))): _*)
    graft.functions.VectorExpressions.registerAny(spark)
    val fresh = Tables.embeddings(spark, sf).select(col("vec_id"),
      (array_position(dists(col("embedding")), array_min(dists(col("embedding")))) - 1)
        .cast("int").as("cluster"))
    val stored = ml.HybridIndex.assigned(spark, sf)
    assert(stored.join(fresh, Seq("vec_id", "cluster")).count() == fresh.count())
  }

  test("q306: panel arithmetic matches a plain-Scala recount") {
    val rows = Round10Ops.q306LDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getString(2).split(" ").count(_.nonEmpty).toLong / GovernanceOps.KAnonLenBucket))
    val groups = docs.groupBy(d => (d._1, d._3))
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val gs = groups.filter(_._1._1 == lang)
      assert(r.getAs[Long]("n_groups") == gs.size)
      val lowDiv = gs.filter(_._2.map(_._2).distinct.length < Round10Ops.LDivL)
      assert(r.getAs[Long]("n_low_div_groups") == lowDiv.size)
      assert(r.getAs[Long]("n_at_risk") == lowDiv.values.map(_.length.toLong).sum)
      assert(r.getAs[Long]("risk_micro") ==
        r.getAs[Long]("n_at_risk") * 1000000L / r.getAs[Long]("n_docs"))
    }
  }

  test("q307: pair counts match a plain-Scala gram recount and bound by the total") {
    val rows = Round10Ops.q307SpanProvenance(spark, sf).collect()
    assert(rows.nonEmpty)
    val k = Round9Ops.SpanGram
    // hash-based model, mirroring the query exactly: the operator keys
    // on polynomial HASHES (engine-parity by construction), and two
    // distinct gram strings may collide — a string-keyed model diverges
    val P = graft.functions.Portable.P
    def tokHash(t: String): Long = t.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % P)
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq.map(tokHash))
    val grams = docs.flatMap { case (src, hs) =>
      (0 to hs.length - k).map(i =>
        (src, hs.slice(i, i + k).foldLeft(0L)((a, h) => (a * 31 + h) % P)))
    }
    val dup = grams.groupBy(_._2).filter(_._2.size >= Round9Ops.SpanMinCount).keySet
    val bySrc = grams.filter(g => dup(g._2)).groupBy(_._1)
      .map { case (s, gs) => s -> gs.map(_._2).toSet }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a <= b)
      val want = (bySrc.getOrElse(a, Set.empty) intersect bySrc.getOrElse(b, Set.empty)).size
      assert(r.getAs[Long]("n_shared_hashes") == want,
        s"pair ($a, $b): got ${r.getAs[Long]("n_shared_hashes")}, scala $want")
      assert(r.getAs[Long]("n_shared_hashes") <= r.getAs[Long]("n_dup_hashes"))
    }
  }
}
