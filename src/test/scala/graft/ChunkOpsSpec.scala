package graft

import graft.operators.ChunkOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the storage-dedup/audit tier (q241–q243). */
class ChunkOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q241: chunks partition every token; sharing exists and is bounded") {
    val r = ChunkOps.q241CdcChunks(spark, sf).collect()
    val totalTokens = Tables.documents(spark, sf)
      .select(explode(graft.functions.Portable.tokens(col("text"))).as("t")).count()
    assert(r.map(_.getLong(4)).sum == totalTokens,
      "chunk token mass must equal the corpus token count")
    r.foreach { row =>
      assert(row.getLong(2) <= row.getLong(1), "distinct <= total chunks")
      assert(row.getLong(3) <= row.getLong(1), "shared <= total chunks")
    }
    assert(r.map(_.getLong(3)).sum > 0, "fixture has cross-doc repeats; sharing must show")
  }

  test("q242: the S-curve — 4-band pairs are high-jaccard, 1-band pairs low") {
    val r = ChunkOps.q242LshTuning(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(0) >= 1 && row.getLong(0) <= 4)
      assert(row.getLong(1) >= 0 && row.getLong(1) <= 9)
    }
    def wavg(rows: Array[org.apache.spark.sql.Row]) = {
      val n = rows.map(_.getLong(2)).sum
      rows.map(x => x.getLong(2) * x.getLong(3)).sum.toDouble / n
    }
    val one = r.filter(_.getLong(0) == 1)
    val four = r.filter(_.getLong(0) == 4)
    assert(one.nonEmpty && four.nonEmpty)
    assert(wavg(four) > wavg(one),
      "pairs colliding in all 4 bands must average higher jaccard than 1-band pairs")
  }

  test("q243: alignment distance is a bounded metric over successor pairs") {
    val r = ChunkOps.q243SeqAlign(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (la, lb, dist, sim) =
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
      assert(row.getLong(1) == row.getLong(0) + 1)
      // levenshtein bounds: |la-lb| <= d <= max(la,lb)
      assert(dist >= math.abs(la - lb) && dist <= math.max(la, lb))
      assert(sim >= 0 && sim <= 1000000L)
    }
  }
}
