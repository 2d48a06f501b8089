package graft

import graft.operators.{GovernanceOps, GraphOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the governance audits beyond the DuckDB hash check:
  * q296's overlap matrix, q297's k-core, q298's κ, and q299's
  * anonymity accounting are each re-derived independently in Scala. */
class GovernanceOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q296: complete unordered pair matrix, overlap bounds hold") {
    val rows = GovernanceOps.q296SourceOverlap(spark, sf).collect()
    val srcs = Tables.documents(spark, sf).select(col("source"))
      .distinct().collect().map(_.getString(0)).sorted
    assert(rows.length == srcs.length * (srcs.length - 1) / 2,
      "every unordered source pair must appear, including zero-overlap pairs")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(a < b, "pairs must be canonically ordered")
      val sh = r.getAs[Long]("n_shared")
      assert(sh <= math.min(r.getAs[Long]("n_fp_a"), r.getAs[Long]("n_fp_b")))
      assert(r.getAs[Long]("jaccard_micro") <=
        math.min(r.getAs[Long]("contain_a_micro"), r.getAs[Long]("contain_b_micro")))
    }
  }

  test("q296: shared counts match an independent set-intersection") {
    val bySrc = Tables.documents(spark, sf)
      .select(col("source"), lower(col("text")).as("t")).collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getString(1)).toSet }
      .toSeq.sortBy(_._1)
    val got = GovernanceOps.q296SourceOverlap(spark, sf).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Long]("n_shared")).toMap
    for (i <- bySrc.indices; j <- i + 1 until bySrc.length) {
      val (a, sa) = bySrc(i); val (b, sb) = bySrc(j)
      assert(got((a, b)) == (sa intersect sb).size.toLong,
        s"shared($a,$b) drifted")
    }
  }

  test("q297: peeling matches a serial Scala k-core on the same graph") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val e0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("a"),
        (col("l_suppkey").cast("long") * 2 + 1).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = (e0 ++ e0.map(_.swap)).toSet
    for (_ <- 1 to GraphOps.KCorePeels) {
      val deg = edges.toSeq.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= GraphOps.KCoreK).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val degF = edges.toSeq.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val rows = GraphOps.q297KCore(spark, sf).collect()
    assert(rows.nonEmpty == degF.nonEmpty)
    rows.foreach { r =>
      val node = r.getAs[Long]("node")
      assert(degF(node) == r.getAs[Long]("deg"), s"deg($node) drifted")
      assert(r.getAs[Long]("n_core") == degF.size.toLong)
      assert(r.getAs[Boolean]("converged") ==
        (degF.isEmpty || degF.values.min >= GraphOps.KCoreK))
    }
    // top-20 really is the head of (deg desc, node)
    val want = degF.toSeq.sortBy { case (n, dg) => (-dg, n) }.take(20)
    assert(rows.map(r => (r.getAs[Long]("node"), r.getAs[Long]("deg"))).toSeq
      == want)
  }
  test("q298: vote histogram partitions n, majority and reliabilities cohere") {
    val rows = GovernanceOps.q298LabelMajority(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val (k3, k2, d2, d3) = (r.getAs[Long]("n_keep_3_0"), r.getAs[Long]("n_keep_2_1"),
        r.getAs[Long]("n_drop_2_1"), r.getAs[Long]("n_drop_3_0"))
      assert(k3 + k2 + d2 + d3 == n, "vote histogram must partition n")
      assert(r.getAs[Long]("n_majority_keep") == k3 + k2,
        "majority keep = unanimous + 2-1 keeps")
      // each labeler disagrees with the majority ONLY on 2-1 rows, so its
      // agreement count is bounded below by the unanimous rows
      Seq("agree_a", "agree_b", "agree_c").foreach { c =>
        val ag = r.getAs[Long](c)
        assert(ag >= k3 + d3 && ag <= n, s"$c out of bounds: $r")
      }
      // the three labelers' majority-disagreements total exactly the 2-1
      // rows (each such row has exactly one dissenter)
      val disagree = 3 * n - r.getAs[Long]("agree_a") -
        r.getAs[Long]("agree_b") - r.getAs[Long]("agree_c")
      assert(disagree == k2 + d2, s"dissent accounting drifted: $r")
      assert(r.getAs[Long]("rel_a_micro") == r.getAs[Long]("agree_a") * 1000000L / n)
    }
  }

  test("q304: histogram accounting coheres and matches a Scala recompute") {
    import graft.functions.Portable
    val rows = GovernanceOps.q304DupClusterProfile(spark, sf).collect()
    assert(rows.nonEmpty, "fixture must contain duplicate-opening clusters")
    // independent recompute of cluster sizes from raw prefixes
    val pres = Tables.documents(spark, sf)
      .select(concat_ws(" ",
        slice(Portable.tokens(col("text")), 1, graft.operators.Round9Ops.SpanGram)))
      .collect().map(_.getString(0))
    val want = pres.groupBy(identity).map(_._2.length.toLong)
      .filter(_ >= 2).groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    assert(rows.map(r => r.getAs[Long]("csize") -> r.getAs[Long]("n_clusters")).toMap
      == want, "size histogram drifted")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_at_size")
        == r.getAs[Long]("csize") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("removable_at_size")
        == (r.getAs[Long]("csize") - 1) * r.getAs[Long]("n_clusters"))
    }
    // the global totals really sum the per-size rows
    val dup = rows.map(r => r.getAs[Long]("n_docs_at_size")).sum
    assert(rows.head.getAs[Long]("dup_docs") == dup)
  }

  test("q299: group accounting matches a Scala recompute per panel") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("source"),
        size(graft.functions.Portable.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(t => (t._1, t._2)).map { case (k, ds) =>
      val groups = ds.groupBy(_._3 / GovernanceOps.KAnonLenBucket)
        .map(_._2.length.toLong).toSeq
      val small = groups.filter(_ < GovernanceOps.KAnonK)
      k -> (ds.length.toLong, groups.length.toLong, small.length.toLong,
        small.sum, groups.min, groups.max)
    }
    val rows = GovernanceOps.q299KAnonymity(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("lang"), r.getAs[String]("source"))
      val (nd, ng, nsg, nar, mn, mx) = want(k)
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_groups") == ng)
      assert(r.getAs[Long]("n_small_groups") == nsg)
      assert(r.getAs[Long]("n_at_risk") == nar)
      assert(r.getAs[Long]("min_group") == mn && r.getAs[Long]("max_group") == mx)
      assert(r.getAs[Long]("risk_micro") == nar * 1000000L / nd)
    }
  }
}
