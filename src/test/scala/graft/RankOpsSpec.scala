package graft

import graft.operators.RankOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the stratification/ranking tier (q233–q236). */
class RankOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q233: buckets are ordered by score and cover the held-out docs") {
    val r = RankOps.q233PerplexityBuckets(spark, sf).collect()
    val byBucket = r.groupBy(_.getString(4)).view.mapValues(_.map(_.getLong(3))).toMap
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    assert(byBucket.contains("head") && byBucket.contains("tail"))
    assert(byBucket("head").min > byBucket("tail").max,
      "every head doc must outscore every tail doc")
    if (byBucket.contains("middle")) {
      assert(byBucket("head").min > byBucket("middle").max)
      assert(byBucket("middle").min > byBucket("tail").max)
    }
    // every held-out doc with at least one bigram is scored
    val expected = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .filter(size(graft.functions.Portable.tokens(col("text"))) >= 2)
      .count()
    assert(r.length == expected)
  }

  test("q234: mined triplets respect label constraints and batch-hardness") {
    val labels = Tables.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val t = RankOps.q234TripletMine(spark, sf).collect()
    assert(t.nonEmpty)
    t.foreach { row =>
      val (aid, pid, nid) = (row.getLong(0), row.getLong(2), row.getLong(4))
      assert(labels(pid) == labels(aid), "positive must share the anchor label")
      assert(labels(nid) != labels(aid), "negative must differ from the anchor label")
      assert(math.abs(row.getDouble(6) - (row.getDouble(5) - row.getDouble(3))) < 1e-6)
    }
    // brute-force check one anchor: the mined positive really is hardest
    val a0 = t.head.getLong(0)
    val e = Tables.embeddings(spark, sf)
    val ae = e.filter(col("vec_id") === a0).select(col("embedding").as("ae"), col("label").as("al"))
    val brute = e.crossJoin(ae)
      .filter(col("vec_id") =!= a0 && col("label") === col("al"))
      .withColumn("cos", graft.functions.Portable.cosine(col("ae"), col("embedding")))
      .orderBy(col("cos").asc, col("vec_id")).limit(1)
      .collect().head
    assert(brute.getLong(0) == t.head.getLong(2))
  }

  test("q235: ten fused results per query, fused score non-increasing") {
    val r = RankOps.q235RrfHybrid(spark, sf).collect()
    val byQ = r.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.length == RankOps.RrfTopN)
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(1L to RankOps.RrfTopN.toLong))
      val scores = sorted.map(_.getLong(5))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      rows.foreach(row => assert(row.getLong(3) >= 1 && row.getLong(4) >= 1))
    }
    assert(byQ.nonEmpty)
  }

  test("q245: every doc weighted once; weights invert cluster sizes") {
    val r = graft.operators.WeightOps.q245DedupWeights(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(r.length == nDocs)
    assert(r.map(_.getLong(0)).distinct.length == nDocs)
    r.foreach { row =>
      val (csize, w) = (row.getLong(2), row.getLong(3))
      assert(csize >= 1)
      if (csize == 1L) assert(w == 1000000L)
      else assert(w > 0 && w < 1000000L && math.abs(w * csize - 1000000L) <= csize)
    }
    // effective corpus (Σ weights) = #clusters, within per-cluster rounding
    val sumW = r.map(_.getLong(3)).sum
    val nClusters = r.map(row => 1.0 / row.getLong(2)).sum // Σ 1/size over docs = #clusters
    assert(math.abs(sumW / 1e6 - nClusters) < 1.0)
    // near-dups exist in the fixture, so some cluster must be > 1
    assert(r.exists(_.getLong(2) > 1L))
  }

  test("q246: RBO is bounded and grows with overlap") {
    val r = graft.operators.RankOps.q246RankOverlap(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(1) >= 0 && row.getLong(1) <= graft.operators.RankOps.RboDepth)
      assert(row.getLong(2) >= 0 && row.getLong(2) <= 1000000000L)
      // zero overlap at full depth forces RBO 0
      if (row.getLong(1) == 0) assert(row.getLong(2) == 0)
    }
    // queries exist for every %97 doc that has both legs
    assert(r.map(_.getLong(0)).forall(_ % 97 == 0))
  }

  test("q236: folds partition the data and stay balanced") {
    val r = RankOps.q236FoldAudit(spark, sf).collect()
    assert(r.map(_.getLong(2)).sum == Tables.orders(spark, sf).count())
    val perFold = r.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perFold.size == RankOps.Folds)
    val (mx, mn) = (perFold.values.max, perFold.values.min)
    assert(mx.toDouble / mn < 1.1, s"hash folds out of balance: $perFold")
  }
}
