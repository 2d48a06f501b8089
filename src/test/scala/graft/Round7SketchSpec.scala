package graft

import graft.operators.ScaleOps2
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + property checks for the round-7 sketch/sampling quartet:
  * Misra–Gries heavy hitters (q179), two-phase prefix-sum PPS sampling
  * (q180), KMV distinct sketches (q181), per-language stratified quality
  * filter (q182). Value parity with DuckDB is the oracle gate's job;
  * these pin the guarantees each operator exists for. */
class Round7SketchSpec extends AnyFunSuite {
  import TestSpark._

  // ---- q179: the MG completeness theorem, on the shipped fold ----

  test("q179: MG fold keeps ≤ k counters and never misses a >n/k item") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 50) {
      val k = 1 + rnd.nextInt(8)
      val universe = (0 until (1 + rnd.nextInt(12))).map(i => s"u$i")
      // adversarial mixes: skewed zipf-ish + uniform tails + runs
      val stream = scala.collection.mutable.ArrayBuffer[String]()
      for (_ <- 0 until 200 + rnd.nextInt(400)) {
        val u = universe(math.min(
          (math.abs(rnd.nextGaussian()) * universe.size / 3).toInt,
          universe.size - 1))
        val run = 1 + rnd.nextInt(3)
        for (_ <- 0 until run) stream += u
      }
      val n = stream.size.toLong
      val survivors = ScaleOps2.misraGries(stream.iterator, k).toSet
      assert(survivors.size <= k, s"trial $trial: ${survivors.size} > k=$k")
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
      truth.foreach { case (item, c) =>
        if (c > n / k)
          assert(survivors.contains(item),
            s"trial $trial: item $item count=$c > n/k=${n / k} missed")
      }
    }
  }

  test("q179: sketch+verify equals the plain groupBy-having answer") {
    val got = ScaleOps2.q179HeavyHitters(spark, sf).collect()
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.functions.Portable.tokens(col("text"))).as("tok"))
    val n = toks.count()
    val thresh = n / ScaleOps2.MgK + 1
    val want = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(thresh))
      .orderBy(col("cnt").desc, col("tok")).collect()
    assert(got.map(_.toString).sameElements(want.map(_.toString)))
  }

  // ---- q180: two-phase prefix sum ≡ the single global window ----

  test("q180: distributed cumsum equals global-window cumsum; ≤ k rows picked") {
    val got = ScaleOps2.q180PpsSample(spark, sf).collect()
    assert(got.length <= 100 && got.nonEmpty)
    // driver-side brute force of the same selection rule
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = rows.map(_._2).sum
    var cum = 0L
    val want = rows.flatMap { case (id, w) =>
      val prev = cum; cum += w
      if (cum * 100 / total > prev * 100 / total) Some((id, w, cum)) else None
    }
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sameElements(want))
  }

  test("q180: the row-level window is partitioned by bucket (no global row sort)") {
    val plan = ScaleOps2.q180PpsSample(spark, sf)
      .queryExecution.optimizedPlan.toString
    // the only ORDER-only window must be over the bucket-total relation;
    // the per-row running sum carries its bucket partition spec
    assert(plan.contains("partitionBy") || plan.toLowerCase.contains("bucket"),
      s"expected bucket-partitioned window in:\n$plan")
  }

  // ---- q181: KMV estimator sanity ----

  test("q181: exact-mode groups return est == n_exact; sketch mode within 50%") {
    val rows = ScaleOps2.q181KmvDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nExact, est) = (r.getAs[Long]("n_exact"), r.getAs[Long]("est"))
      if (nExact < ScaleOps2.KmvK) assert(est == nExact)
      else {
        val rel = math.abs(est.toDouble - nExact) / nExact
        assert(rel < 0.5, s"source ${r.getString(0)}: est=$est exact=$nExact rel=$rel")
      }
    }
  }

  // ---- q183: incremental delta-vs-index dedup ----

  test("q183: every pair is delta-probe vs standing-index; jac in [0.5,1]") {
    val rows = graft.operators.TextOps.q183DeltaDedup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) % 8 == 7, s"da ${r.getLong(0)} not in the delta batch")
      assert(r.getLong(1) % 8 != 7, s"db ${r.getLong(1)} not in the standing corpus")
      val j = r.getAs[Double]("jac")
      assert(j >= 0.5 - 1e-9 && j <= 1.0 + 1e-9)
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  // ---- q182: stratification invariants ----

  test("q182: keeps exactly ceil(n_lang/4) docs per language, best-first") {
    val kept = ScaleOps2.q182LangStrata(spark, sf).collect()
    val perLang = Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptByLang = kept.groupBy(_.getString(1))
    perLang.foreach { case (lang, n) =>
      val want = (n + 3) / 4
      assert(keptByLang.get(lang).map(_.length.toLong).getOrElse(0L) == want,
        s"lang $lang: expected $want of $n")
    }
    // within a language, kept scores dominate: rn is 1..ceil(n/4) contiguous
    keptByLang.foreach { case (_, rows) =>
      val rns = rows.map(_.getAs[Int]("rn")).sorted
      assert(rns.sameElements(1 to rns.length))
    }
  }
}
