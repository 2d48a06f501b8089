package graft

import graft.operators.EmbedQa
import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the representation-QA tier (q270–q271). */
class EmbedQaSpec extends AnyFunSuite {
  import TestSpark._

  test("q270: the sufficient-statistic pairwise dot matches a brute-force pair mean") {
    val r = EmbedQa.q270Anisotropy(spark, sf).collect()
    assert(r.nonEmpty)
    // brute-force one label: mean over actual pairs of quantized dots
    val label0 = r.head.getInt(0)
    val vecs = Tables.embeddings(spark, sf)
      .filter(col("label") === label0)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x * 1e6 + 0.5) / 1e6).toArray)
    var sum = 0.0
    for (i <- vecs.indices; j <- vecs.indices if i != j)
      sum += vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
    val brute = sum / (vecs.length.toDouble * (vecs.length - 1))
    val got = r.head.getLong(3).toDouble / 1e6
    assert(math.abs(got - brute) < 1e-3,
      s"sufficient-statistic anisotropy $got vs brute pair mean $brute")
    // norms are positive
    r.foreach(row => assert(row.getLong(2) > 0))
  }

  test("q271: conditional entropy is bounded by log of the branching factor") {
    val r = EmbedQa.q271TransitionEntropy(spark, sf).collect()
    assert(r.nonEmpty)
    val total = r.map(_.getLong(1)).sum
    val expected = Tables.events(spark, sf).count() -
      Tables.events(spark, sf).select("user_id").distinct().count()
    assert(total == expected, "transitions = events − users (one less per user)")
    r.foreach { row =>
      val (k, h) = (row.getLong(2), row.getLong(3).toDouble / 1e9)
      assert(h >= 0)
      assert(h <= math.log(k.toDouble) + 1e-3,
        s"H(next|cur)=$h must not exceed ln($k)")
    }
  }
}
