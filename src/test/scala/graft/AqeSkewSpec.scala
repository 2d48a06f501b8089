package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling — the runtime re-plan path SCALING.md leans on
  * for hot keys: a join with one dominant key must be split by
  * OptimizeSkewedJoin (skew=true in the final adaptive plan) without
  * changing results. Thresholds are shrunk so local data triggers it. */
class AqeSkewSpec extends AnyFunSuite {
  import TestSpark._

  test("skewed sort-merge join is split by AQE and results are unchanged") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    import s2.implicits._

    // 95% of left rows share one key — a classic hot key
    val left = s2.range(0, 200000)
      .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
    val right = s2.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = left.join(right, "k")

    // collect() executes THIS DataFrame's QueryExecution (count() would
    // finalize a different one), letting AQE finalize the inspected plan
    val n = joined.collect().length.toLong
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("skew=true"), s"expected AQE skew split:\n${plan.take(1200)}")
    // correctness unchanged: every left row with k in [0,1000) matches exactly once
    val expected = left.filter(col("k") < 1000).count()
    assert(n == expected)
  }
}

/** Runtime bloom-filter join pruning: a selective dim-side filter injects a
  * bloom filter on the fact side so non-matching fact rows die at the scan
  * — Spark's runtime answer to the 100 TB selective-join problem. */
class RuntimeBloomFilterSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("selective join injects a bloom filter on the fact side") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.lineitem(s2, sf)
    val o = Tables.orders(s2, sf).filter(col("o_totalprice") > 450000.0)
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
    assert(j.queryExecution.optimizedPlan.toString.toLowerCase.contains("bloom"))
    // results unchanged vs the unfiltered-plan session
    val expected = Tables.lineitem(spark, sf).join(
      Tables.orders(spark, sf).filter(col("o_totalprice") > 450000.0),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(j.count() == expected)
  }
}
