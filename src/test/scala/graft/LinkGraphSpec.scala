package graft

import graft.operators.{GraphOps, Linkage, PqOps}
import org.scalatest.funsuite.AnyFunSuite

class LinkGraphSpec extends AnyFunSuite {
  import TestSpark._

  test("q149 IVF-PQ: per-query ADC ranking is well-formed and corpus-only") {
    val rows = PqOps.q149IvfPqSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("cid") >= PqOps.Ks)) // codebook donors never returned
    assert(rows.forall(_.getAs[Double]("adc") >= 0.0))
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to rs.length))
      val adcs = sorted.map(_.getAs[Double]("adc"))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b + 1e-9 })
    }
    spark.catalog.clearCache()
  }

  test("q150 entity resolution: pairs are same-block, thresholded, distance-exact") {
    val rows = Linkage.q150EntityResolution(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("a_key") != r.getAs[Long]("b_key")))
    assert(rows.forall(_.getAs[Long]("dist") <= Linkage.MaxDist))
    // dist = 0 ⟺ identical names (the exact-duplicate listings)
    assert(rows.exists(_.getAs[Long]("dist") == 0L))
    assert(rows.filter(_.getAs[Long]("dist") == 0L)
      .forall(r => r.getAs[String]("a_name") == r.getAs[String]("b_name")))
    assert(rows.filter(_.getAs[Long]("dist") > 0L)
      .forall(r => r.getAs[String]("a_name") != r.getAs[String]("b_name")))
  }

  test("q152 item similarity: symmetric co-counts, cosine in (0,1], per-item ranking") {
    val rows = graft.operators.Recsys.q152ItemSimilarity(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("s1") != r.getAs[Long]("s2")))
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cos"); c > 0.0 && c <= 1.0
    })
    // co(s1,s2) is symmetric: every reported pair's mirror carries the
    // same raw co-count (the mirror may or may not make the other side's
    // top-k, so compare on the full pair set via a keyed lookup)
    val co = rows.map(r => (r.getAs[Long]("s1"), r.getAs[Long]("s2")) -> r.getAs[Long]("co")).toMap
    co.foreach { case ((a, b), n) => co.get((b, a)).foreach(m => assert(m == n)) }
    rows.groupBy(_.getAs[Long]("s1")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rs.length))
    }
    spark.catalog.clearCache()
  }

  test("q153 TF-IDF cosine: pairs ordered, cosine within Cauchy-Schwarz bounds") {
    val rows = graft.operators.ScaleOps.q153TfidfCosine(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("da") < r.getAs[Long]("db")))
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cos"); c >= 0.5 && c <= 1.0 + 1e-6
    })
    spark.catalog.clearCache()
  }

  test("q151 PageRank: top-20 is rank-ordered, above the damping floor, hubs above mean") {
    val rows = GraphOps.q151Pagerank(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rnk")).toSeq == (1 to 20))
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // mean-1 normalization: every rank ≥ (1 - damping); the top hub sits
    // above the mean
    assert(ranks.forall(_ >= 1.0 - GraphOps.Damping))
    assert(ranks.head > 1.0)
  }
}
