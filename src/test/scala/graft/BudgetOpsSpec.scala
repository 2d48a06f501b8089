package graft

import graft.operators.BudgetOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the token-budget tier beyond the DuckDB hash check:
  * fertility/waste accounting is re-derived in plain Scala, and q302's
  * envelope theorem (|estimate − exact| ≤ bin width) is asserted to
  * hold with NO slack consumed on top of the float epsilon. */
class BudgetOpsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docTok: Seq[(String, String, Long)] =
    Tables.documents(spark, sf)
      .select(col("lang"), col("source"),
        size(graft.functions.Portable.tokens(col("text"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

  test("q300: fertility >= 1e6 (subwords never fewer than words) and sums recompute") {
    val rows = BudgetOps.q300TokenFertility(spark, sf).collect()
    assert(rows.nonEmpty)
    val wsWant = docTok.groupBy(t => (t._1, t._2)).map { case (k, ds) =>
      k -> ds.map(_._3).sum
    }
    rows.foreach { r =>
      val k = (r.getAs[String]("lang"), r.getAs[String]("source"))
      assert(r.getAs[Long]("ws_tokens") == wsWant(k), s"ws_tokens drifted for $k")
      // the BPE-ish regex splits punctuation off words, so it can only
      // produce MORE tokens than the whitespace split
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"))
      assert(r.getAs[Long]("fertility_micro") >= 1000000L)
      assert(r.getAs[Long]("chars") > r.getAs[Long]("bpe_tokens"))
    }
  }

  test("q301: kept + truncated = total, padding closes the n*L budget") {
    val rows = BudgetOps.q301TruncationWaste(spark, sf).collect()
    assert(rows.length ==
      docTok.map(_._2).distinct.length * BudgetOps.CtxLengths.length)
    rows.foreach { r =>
      val (nd, l) = (r.getAs[Long]("n_docs"), r.getAs[Long]("ctx_len"))
      assert(r.getAs[Long]("tok_kept") + r.getAs[Long]("tok_truncated")
        == r.getAs[Long]("tok_total"))
      // kept + padding = exactly one L-sized sequence per doc
      assert(r.getAs[Long]("tok_kept") + r.getAs[Long]("tok_padding") == nd * l)
      assert(r.getAs[Long]("util_micro") <= 1000000L)
      assert(r.getAs[Long]("n_fit") <= nd)
    }
    // monotonicity in L per source: larger context keeps more, fits more
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val byL = rs.sortBy(_.getAs[Long]("ctx_len"))
      val kept = byL.map(_.getAs[Long]("tok_kept"))
      val fit = byL.map(_.getAs[Long]("n_fit"))
      assert(kept.zip(kept.tail).forall { case (a, b) => a <= b })
      assert(fit.zip(fit.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q302: the bin-count state is mergeable by vector addition") {
    // the 100 TB claim: shard histograms merge by addition — compute the
    // (flag, bin) vectors over two disjoint halves and over the whole
    // table with the SAME [min,max] frame; sums must be identical
    import graft.operators.BudgetOps.HistBins
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"),
        col("l_orderkey"))
    val mm = li.groupBy(col("flag")).agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    def bins(df: org.apache.spark.sql.DataFrame) = df.join(broadcast(mm), "flag")
      .withColumn("bin", least(floor((col("v") - col("vmin")) /
        ((col("vmax") - col("vmin")) / lit(HistBins.toDouble))).cast("long"),
        lit(HistBins - 1)))
      .groupBy(col("flag"), col("bin")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = bins(li)
    val h1 = bins(li.filter(pmod(col("l_orderkey"), lit(2)) === 0))
    val h2 = bins(li.filter(pmod(col("l_orderkey"), lit(2)) =!= 0))
    val merged = (h1.keySet ++ h2.keySet).map(k =>
      k -> (h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L))).toMap
    assert(merged == whole, "shard histograms must merge to the whole by addition")
  }

  test("q303: damping lifts tails and damps heads, shares cohere") {
    val rows = BudgetOps.q303NegativeSampling(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Long]("c")
      val wantW = math.floor(math.sqrt(math.sqrt(
        c.toDouble * c.toDouble * c.toDouble)) * 1e6 + 0.5).toLong
      assert(r.getAs[Long]("w_micro") == wantW, s"smoothed weight drifted: $r")
    }
    // counts are non-increasing down the rank; damping is non-decreasing
    // (c^{3/4}/c = c^{-1/4} is monotone decreasing in c)
    val byRank = rows.sortBy(_.getAs[Long]("rnk"))
    val cs = byRank.map(_.getAs[Long]("c"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    val damp = byRank.map(_.getAs[Long]("damp_micro"))
    assert(damp.zip(damp.tail).forall { case (a, b) => a <= b + 1 },
      "damping factor must not decrease as counts fall")
    // the raw head share exceeds its sampled share (heads are damped)
    val head = byRank.head
    assert(head.getAs[Long]("samp_share_micro") <= head.getAs[Long]("raw_share_micro"))
  }

  test("q302: envelope holds for every (flag, p) and exact matches a Scala sort") {
    val rows = BudgetOps.q302HistQuantiles(spark, sf).collect()
    assert(rows.length == 3 * BudgetOps.HistPs.length)
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (f, vs) => f -> vs.map(_._2).sorted }
    rows.foreach { r =>
      assert(r.getAs[Boolean]("env_ok"), s"envelope violated: $r")
      assert(math.abs(r.getAs[Long]("est_micro") - r.getAs[Long]("exact_micro"))
        <= r.getAs[Long]("width_micro") + 1L)
      // exact really is the ceil(p*n)-th order statistic
      val f = r.getAs[String]("flag")
      val sorted = vals(f)
      val t = r.getAs[Long]("p_micro").toDouble / 1e6 * sorted.length
      val want = sorted(math.ceil(t).toInt - 1)
      assert(r.getAs[Long]("exact_micro") ==
        math.floor(want * 1e6 + 0.5).toLong, s"exact drifted for $r")
    }
  }
}
