package graft

import graft.operators.RetrievalQa
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the retrieval/index QA tier (q263–q264). */
class RetrievalQaSpec extends AnyFunSuite {
  import TestSpark._

  test("q263: NDCG is a proper ratio, 1 only when the ranking is ideal") {
    val r = RetrievalQa.q263Ndcg(spark, sf).collect()
    assert(r.length == graft.operators.Retrieval.QueryTerms.length)
    r.foreach { row =>
      val (dcg, idcg, ndcg) = (row.getLong(1), row.getLong(2), row.getLong(3))
      assert(dcg > 0 && idcg > 0 && dcg <= idcg,
        "realized DCG can never beat the ideal ordering")
      assert(ndcg > 0 && ndcg <= 1000000L)
    }
    // discount weights are strictly decreasing
    val ws = RetrievalQa.DiscountNano.map(_._2)
    assert(ws.zip(ws.tail).forall { case (a, b) => a > b })
  }

  test("q264: shares sum to one; imbalance averages to one across cells") {
    val r = RetrievalQa.q264CellBalance(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 16)
    val shareSum = r.map(_.getLong(2)).sum
    assert(math.abs(shareSum - 1000000L) <= r.length)
    // mean imbalance ≈ 1 when every populated cell is counted
    val imbAvg = r.map(_.getLong(3)).sum / r.length
    assert(math.abs(imbAvg - 1000000L) <= 50000L,
      s"mean imbalance $imbAvg should be ~1e6")
    assert(r.map(_.getLong(1)).sum ==
      Tables.embeddings(spark, sf).filter(org.apache.spark.sql.functions.col("vec_id") >= 16).count())
  }
}
