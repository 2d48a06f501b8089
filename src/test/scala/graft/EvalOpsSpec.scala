package graft

import graft.operators.EvalOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the statistical-evaluation tier (q255–q256). */
class EvalOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q255: bootstrap replicas bracket the true mean with sane effective sizes") {
    val r = EvalOps.q255Bootstrap(spark, sf).collect()
    assert(r.length == EvalOps.BootB)
    val n = Tables.orders(spark, sf).count()
    val trueMean = Tables.orders(spark, sf)
      .agg(avg(col("o_totalprice"))).collect().head.getDouble(0) * 1e6
    // Poisson(1) surrogate: E[n_eff] ≈ n·0.991 (0·.368+1·.368+2·.184+3·.080)
    r.foreach { row =>
      assert(row.getLong(1) > n / 2 && row.getLong(1) < n * 2)
    }
    val means = r.map(_.getLong(2).toDouble)
    assert(means.min < trueMean && trueMean < means.max,
      s"replica envelope [${means.min}, ${means.max}] should bracket $trueMean")
    // spread is O(σ/√n), not O(σ): ~4·(0.6/√1500) ≈ 6% at the smallest
    // fixture, shrinking with √n — 15% is the loose-but-meaningful bound
    assert((means.max - means.min) / trueMean < 0.15)
  }

  test("q256: exact AUC agrees with a brute-force pair count") {
    val row = EvalOps.q256AucExact(spark, sf).collect().head
    val auc = row.getLong(3)
    assert(auc > 0 && auc < 1000000L)
    // brute force on the same scored rows (n² over score VALUES is fine
    // at test scale): P(score_pos > score_neg) + P(equal)/2
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey").as("cat"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("y"))
    val stats = o.groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("ss"))
    val glob = o.agg(count(lit(1)).as("gn"), sum(col("y")).as("gs"))
    val prior = col("gs").cast("double") / col("gn").cast("double")
    val p = floor((col("ss").cast("double") + lit(graft.operators.MlOps.EncM) * prior) /
      (col("n").cast("double") + lit(graft.operators.MlOps.EncM)) * lit(1000000.0) +
      lit(0.5)).cast("long")
    val scored = o.join(stats, "cat").crossJoin(broadcast(glob))
      .select(col("y"), p.as("v")).collect().map(r2 => (r2.getLong(0), r2.getLong(1)))
    val pos = scored.filter(_._1 == 1L).map(_._2)
    val neg = scored.filter(_._1 == 0L).map(_._2)
    var num = 0.0
    // histogram the brute force too, else 3k×12k pairs is slow in scala
    val posH = pos.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val negH = neg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    for ((pv, pc) <- posH; (nv, nc) <- negH) {
      if (pv > nv) num += pc.toDouble * nc
      else if (pv == nv) num += pc.toDouble * nc / 2.0
    }
    val brute = math.floor(num / (pos.length.toDouble * neg.length) * 1e6 + 0.5).toLong
    assert(auc == brute, s"histogram AUC $auc != brute AUC $brute")
  }

  test("q308: pass@k matches exact combinatorics and is monotone in k") {
    import graft.operators.EvalOps
    val rows = EvalOps.q308PassAtK(spark, sf).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_tasks"), r.getAs[Long]("mean_pass_micro"),
          r.getAs[Long]("sum_pass_micro"))).toMap
    // every configured k has a graded row (all fixture tasks have n >= 1)
    assert(rows.keySet == EvalOps.PassKs.map(_.toLong).toSet)
    // exact Scala model: per task (n, c) from the same deterministic
    // derivation, pass@k = 1 - C(n-c,k)/C(n,k) with the query's
    // integer-DIV truncation
    val per = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, evs) =>
        val first = evs.sortBy(e =>
          (e.getAs[java.sql.Timestamp]("ts").getTime,
            e.getAs[java.sql.Timestamp]("ts").getNanos,
            e.getAs[Long]("event_id"))).take(EvalOps.PassN)
        val c = first.count(_.getAs[Double]("value") >= EvalOps.PassThresh).toLong
        (u, first.length.toLong, c)
      }.toSeq
    def fall(x: Long, k: Long): Long = (0L until k).map(i => math.max(x - i, 0L)).product
    EvalOps.PassKs.map(_.toLong).foreach { k =>
      val el = per.filter(_._2 >= k)
      if (el.nonEmpty) {
        val sum = el.map { case (_, n, c) =>
          1000000L - fall(n - c, k) * 1000000L / fall(n, k)
        }.sum
        val (nTasks, mean, sumGot) = rows(k)
        assert(nTasks == el.size, s"k=$k: tasks $nTasks != ${el.size}")
        assert(sumGot == sum, s"k=$k: sum $sumGot != scala $sum")
        assert(mean == sum / el.size)
      }
    }
    // pass@k is monotone non-decreasing in k on the common task set
    val ks = rows.keys.toSeq.sorted
    ks.zip(ks.tail).foreach { case (a, b) =>
      if (rows(a)._1 == rows(b)._1)
        assert(rows(a)._2 <= rows(b)._2, s"pass@$a > pass@$b")
    }
  }
}
