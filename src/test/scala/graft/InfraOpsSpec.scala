package graft

import graft.operators.{InfraOps, ScaleOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the infrastructure tier (q229–q232). Value
  * parity is the DuckDB oracle gate's job; these pin the structural
  * guarantees each operator exists for: Bloom's no-false-negatives,
  * hashing-trick mass conservation, compaction contiguity, and Hilbert
  * bijectivity + locality. */
class InfraOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q229: bloom prefilter has zero false negatives and some false positives") {
    val r = InfraOps.q229BloomPrefilter(spark, sf)
    // no false negatives: every true contamination gram is a candidate,
    // so n_true computed through the filter == exact truth per doc
    val grams = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(graft.functions.Portable.kgramHashes(
          graft.functions.Portable.tokenHashes(
            graft.functions.Portable.tokens(col("text"))),
          graft.operators.Curation.ContamK)).as("g"))
    val bench = grams.filter(col("doc_id") % 29 === 0).select("g").distinct()
    val truth = grams.filter(col("doc_id") % 29 =!= 0)
      .select(col("doc_id"), col("g")).distinct()
      .join(bench, "g").groupBy("doc_id").agg(count(lit(1)).as("t"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r.collect().foreach { row =>
      assert(row.getLong(3) == truth.getOrElse(row.getLong(0), 0L),
        s"doc ${row.getLong(0)}: bloom-verified hits must equal exact truth")
      assert(row.getLong(2) >= row.getLong(3) && row.getLong(4) >= 0)
    }
    // the filter is a real approximation at this geometry: some FP exist
    assert(r.agg(sum("n_false_pos")).collect().head.getLong(0) > 0)
  }

  test("q230: hashed features conserve token mass") {
    val r = InfraOps.q230FeatureHash(spark, sf)
    assert(r.filter(col("bucket") < 0 || col("bucket") >= InfraOps.FhBuckets).count() == 0)
    // sum of signed weights = (#positive-sign tokens) − (#negative-sign
    // tokens); |sum| can never exceed the total token count
    val nTok = Tables.documents(spark, sf)
      .select(explode(graft.functions.Portable.tokens(col("text"))).as("t")).count()
    val sAbs = r.agg(sum(abs(col("w")))).collect().head.getLong(0)
    assert(sAbs > 0 && sAbs <= nTok)
  }

  test("q231: compaction plan partitions all bytes into contiguous day ranges") {
    val plan = InfraOps.q231CompactionPlan(spark, sf).collect()
    val totalPlanned = plan.map(_.getLong(3)).sum
    val actual = Tables.events(spark, sf)
      .agg((sum(length(col("props"))) + count(lit(1)) * 16)).collect().head.getLong(0)
    assert(totalPlanned == actual, "planned bytes must partition the input exactly")
    plan.groupBy(_.getString(0)).values.foreach { bins =>
      val sorted = bins.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDate(5).before(b.getDate(4)),
            "output files must cover disjoint, ordered day ranges")
        case _ =>
      }
      // every planned file except possibly the last reaches the target
      sorted.dropRight(1).foreach { r =>
        assert(r.getLong(3) >= InfraOps.CompactTarget ||
          r.getLong(2) > 0, "non-terminal bins pack at least to target or hold parts")
      }
    }
  }

  test("q232: hilbert index is a bijection on the full grid") {
    val n = 1 << ScaleOps.ZBits
    val grid = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("xb"), (col("id") % n).cast("long").as("yb"))
      .withColumn("h", InfraOps.hilbertCol)
    val stats = grid.agg(countDistinct("h").as("dh"), min("h").as("mn"), max("h").as("mx"))
      .collect().head
    assert(stats.getLong(0) == n.toLong * n, "hilbert must be a bijection")
    assert(stats.getLong(1) == 0L && stats.getLong(2) == n.toLong * n - 1)
    // adjacency: consecutive hilbert indices are grid neighbors (the
    // locality property Morton lacks); spot-check a contiguous run
    val byH = grid.filter(col("h") < 1024).orderBy("h").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    byH.sliding(2).foreach {
      case Array((x1, y1), (x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"consecutive hilbert cells must be adjacent: ($x1,$y1)->($x2,$y2)")
      case _ =>
    }
  }

  test("q244: native hilbert expression is bit-equal to the portable fold on the full grid") {
    val n = 1 << ScaleOps.ZBits
    graft.functions.LayoutExpressions.register(spark, ScaleOps.ZBits)
    val grid = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("xb"), (col("id") % n).cast("long").as("yb"))
      .withColumn("h_fold", InfraOps.hilbertCol)
      .withColumn("h_native", graft.functions.LayoutExpressions.hilbertF("xb", "yb"))
    assert(grid.filter(col("h_fold") =!= col("h_native")).count() == 0)
    // the native path stays inside whole-stage codegen (no interpreted HOF)
    // `*(n)` marks a WholeStageCodegen stage in the rendered plan
    val plan = grid.select("h_native").queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen in:\n$plan")
  }

  test("q232 vs q119: hilbert buckets are no looser than morton buckets") {
    val hil = InfraOps.q232HilbertLayout(spark, sf)
      .agg(sum(col("span_area") * col("n_rows"))).collect().head.getLong(0)
    val mor = ScaleOps.q119ZorderLayout(spark, sf)
      .agg(sum(col("span_area") * col("n_rows"))).collect().head.getLong(0)
    assert(hil <= mor, s"row-weighted hilbert box area $hil should not exceed morton $mor")
  }
}
