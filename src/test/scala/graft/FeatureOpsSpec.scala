package graft

import graft.operators.FeatureOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the feature/sketch trio: deterministic HLL
  * (q195), embedding moments via the custom array aggregate (q196),
  * token offsets (q197). Value parity is the DuckDB oracle gate's job. */
class FeatureOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q195: HLL estimate within the m=64 error band of the exact count") {
    val rows = FeatureOps.q195Hll(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1).toDouble, r.getDouble(4))
      assert(est > 0)
      // σ ≈ 1.04/√64 = 13%; allow 4σ
      assert(math.abs(est - exact) / exact < 0.52,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("q196: custom array aggregate equals the explode-groupBy plan") {
    val fast = FeatureOps.q196EmbedMoments(spark, sf).collect()
    val slow = Tables.embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("xd", col("x").cast("double"))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("xd") * 1000000.0 + 0.5).cast("long")).as("s1"),
        sum(floor(col("xd") * col("xd") * 1000000.0 + 0.5).cast("long")).as("s2"))
      .select(col("label"), col("dim"),
        floor(col("s1").cast("double") / col("n") + 0.5).cast("long").as("mean_micro"),
        floor(col("s2").cast("double") / col("n")
          - (col("s1").cast("double") / col("n") / 1000000.0)
            * (col("s1").cast("double") / col("n") / 1000000.0) * 1000000.0
          + 0.5).cast("long").as("var_micro"))
      .orderBy(col("label"), col("dim")).collect()
    assert(fast.map(_.toString).sameElements(slow.map(_.toString)))
  }

  test("q196: plan aggregates via ObjectHashAggregate with partial merge, no pre-agg explode") {
    val plan = FeatureOps.q196EmbedMoments(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"custom agg missing:\n${plan.take(1200)}")
    assert(plan.contains("partial_arraysumfixed") || plan.contains("partial_array_sum_fixed"),
      s"map-side partial aggregation must apply:\n${plan.take(1200)}")
    // the explode (generator) must sit ABOVE the aggregate, not below it
    val aggIdx = plan.indexOf("ObjectHashAggregate")
    val genIdx = plan.indexOf("Generate")
    assert(genIdx >= 0 && genIdx < aggIdx,
      "posexplode must run on the aggregated |labels|-sized result")
  }

  test("q197: offsets are consistent — substring(start, len) recovers each token") {
    val rows = FeatureOps.q197TokenOffsets(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (doc, tok, st, en) =
        (r.getLong(0), r.getString(2), r.getLong(3).toInt, r.getLong(4).toInt)
      assert(texts(doc).substring(st, en) == tok,
        s"doc $doc [$st,$en) != '$tok'")
    }
  }
}
