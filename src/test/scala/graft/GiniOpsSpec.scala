package graft

import graft.operators.GiniOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the concentration tier (q273). */
class GiniOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q273: histogram Gini equals the brute sorted-rank formula and is bounded") {
    val r = GiniOps.q273Gini(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(r.length == docs.select("source").distinct().count())
    r.foreach(row => assert(row.getLong(3) >= 0 && row.getLong(3) < 1000000L))
    // brute-force one source: sort the lengths, apply G = Σ(2i−n−1)xᵢ/(nΣx)
    val src = r.head.getString(0)
    val lens = docs.filter(col("source") === src)
      .select(size(graft.functions.Portable.tokens(col("text"))).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = lens.length.toLong
    val sx = lens.sum
    val num = lens.zipWithIndex.map { case (x, i0) =>
      x * (2L * (i0 + 1) - n - 1)
    }.sum
    val brute = math.floor(num.toDouble / (n.toDouble * sx) * 1e6 + 0.5).toLong
    assert(r.head.getLong(3) == brute,
      s"histogram Gini ${r.head.getLong(3)} != sorted-rank Gini $brute")
  }
}
