package graft

import graft.operators.{HistoryOps, ScaleOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + plan-shape checks for the round-7 additions: salted join
  * (q173), incremental aggregate maintenance (q174), and prefix-filtered
  * AllPairs exact similarity join (q175). Value parity is the DuckDB
  * oracle gate's job; these pin the semantics and plan shapes each
  * operator exists for. */
class Round7OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q173: salted join result equals the plain unsalted join") {
    val salted = ScaleOps.q173SaltedJoin(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    val sup = Tables.supplier(spark, sf)
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(graft.operators.Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("s_nationkey")).collect()
    assert(salted.map(_.toString).sameElements(plain.map(_.toString)))
  }

  test("q173: plan shuffles the fact side on (key, salt), not a broadcast") {
    val plan = ScaleOps.q173SaltedJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a shuffle join in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), "salt demo must not broadcast")
  }

  test("q174: incremental fold equals full recompute, state+delta disjoint") {
    val merged = HistoryOps.q174IncrementalAgg(spark, sf)
    val orders = Tables.orders(spark, sf)
    val full = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        graft.operators.Det.dsum(col("o_totalprice")).as("spend"),
        max(col("o_orderdate")).as("last_order"))
    assert(merged.count() == full.count())
    // every order lands in exactly one side of the cutoff
    val n = orders.count()
    val nState = orders.filter(col("o_orderdate") < lit(HistoryOps.DeltaCutoff)).count()
    val nDelta = orders.filter(col("o_orderdate") >= lit(HistoryOps.DeltaCutoff)).count()
    assert(nState + nDelta == n)
    assert(nState > 0 && nDelta > 0, "cutoff must split the data for the test to mean anything")
    // spot-check: total orders across customers match
    val mTot = merged.agg(sum("n_orders")).collect().head.getLong(0)
    assert(mTot == n)
  }

  test("q175: prefix filtering is lossless vs the brute-force self-join") {
    val pruned = TextOps.q175AllpairsPrefix(spark, sf).collect()
    // brute force: every pair sharing >=1 shingle, exact Jaccard >= 1/2
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(graft.functions.Portable.kgramHashes(
          graft.functions.Portable.tokenHashes(
            graft.functions.Portable.tokens(col("text"))), 5)).as("sh"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(lit(3) * col("inter") >= col("na") + col("nb"))
      .select("da", "db").orderBy("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = pruned.map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    assert(got.sameElements(brute),
      s"prefix filter dropped pairs: got ${got.length}, brute ${brute.length}")
  }

  test("q176: BFS depths form a contiguous ladder from the single source") {
    val rows = graft.operators.GraphOps.q176RecursiveBfs(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDepth = rows.map(r => (r.getAs[Int]("depth"), r.getAs[Long]("n_nodes"))).toMap
    assert(byDepth(0) == 1L, "exactly the source at depth 0")
    // depths are contiguous: a node at depth k implies a neighbor at k-1
    val depths = byDepth.keys.toSeq.sorted
    assert(depths == (0 until depths.length), s"gapped depths: $depths")
    assert(byDepth.values.forall(_ >= 1))
    // depth 1 = the source's direct suppliers; bipartite prefixes alternate
    assert(byDepth.getOrElse(1, 0L) >= 1L)
  }

  test("q177: drifted deliveries union losslessly; pre-drift rows folded") {
    val rows = graft.operators.PipelineQueries.q177SchemaDrift(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == orders.count(), "no rows lost or duplicated across deliveries")
    val predrift = rows.find(_.getAs[String]("o_orderstatus") == "predrift")
    assert(predrift.isDefined)
    assert(predrift.get.getAs[Long]("n") ==
      orders.filter(col("o_orderkey") % 2 === 0).count())
  }

  test("q178: splits cover the corpus; no dup cluster spans two splits") {
    val out = TextOps.q178LeakageSafeSplit(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // re-derive per-doc assignment and assert cluster -> split is a function
    val clusters = TextOps.q55DupClusters(spark, sf).select(col("doc_id"), col("cluster_id"))
    val perDoc = Tables.documents(spark, sf).select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bkt", (col("cluster_id") * lit(2654435761L)) % lit(100L))
      .withColumn("split", when(col("bkt") < 80, lit("train"))
        .when(col("bkt") < 90, lit("val")).otherwise(lit("test")))
    val spanning = perDoc.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("ns")).filter(col("ns") > 1).count()
    assert(spanning == 0, "a dup cluster leaked across splits")
    // every split is non-trivially populated at fixture scale
    assert(out.length == 3 && out.forall(_.getAs[Long]("n_docs") > 0))
  }

  test("q175: jaccard values within [0.5, 1] and pairs ordered") {
    val rows = TextOps.q175AllpairsPrefix(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jac")
      assert(j >= 0.5 - 1e-9 && j <= 1.0 + 1e-9, s"jac $j")
      assert(r.getAs[Long]("da") < r.getAs[Long]("db"))
    }
  }

  test("q200: every batch except a kind's last is at/over budget only via its final item") {
    import graft.operators.MultimodalQueries
    val rows = MultimodalQueries.q200MediaBatches(spark, sf).collect()
    assert(rows.nonEmpty)
    // exclusive-cumsum packing: a batch's total before its last item is
    // < budget, so total_ms < budget + max single duration (5000ms cap
    // at n_chars<=500); and batch ids are dense per kind from 0
    rows.groupBy(_.getString(0)).foreach { case (_, batches) =>
      val ids = batches.map(_.getLong(1)).sorted
      assert(ids.head == 0 && ids.sameElements(ids.head to ids.last))
    }
    rows.foreach { r =>
      assert(r.getLong(3) < MultimodalQueries.BatchBudgetMs + 5001,
        s"batch overrun beyond one item: ${r.mkString(",")}")
    }
    val totalItems = rows.map(_.getLong(2)).sum
    assert(totalItems == Tables.documents(spark, sf).count())
  }

  test("q202: variant extraction agrees with q22's string-path extraction") {
    import graft.operators.Scalars
    val v = Scalars.q202Variant(spark, sf).collect()
    assert(v.nonEmpty)
    // the missing path must be null for every row → zero hits
    assert(v.forall(_.getAs[Long]("n_missing_hits") == 0L))
    // total k over variant path == total k over get_json_object path
    val vSum = v.map(_.getAs[Long]("k_sum")).sum
    val jSum = Scalars.q22Json(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("k_path")).head().getLong(0)
    assert(vSum == jSum, s"variant $vSum vs json-path $jSum")
  }

  test("q201: joint fit decorrelates weekend from trend (finite, plausible coefficients)") {
    import graft.operators.Behavior
    val rows = Behavior.q201MultiRegression(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(!a.isNaN && !b.isNaN && !c.isNaN)
      assert(a > 0, "intercept is a daily volume level — must be positive")
      assert(math.abs(b) < a && math.abs(c) < a,
        "trend/weekend effects are corrections, not the dominant term")
    }
  }
}
