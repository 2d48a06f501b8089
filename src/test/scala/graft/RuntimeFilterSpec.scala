package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence that Catalyst's runtime bloom-filter semi-join reduction
  * fires on this library's join shapes (SURVEY §4): when a shuffle join's
  * build side carries a selective filter, Spark injects a bloom filter of
  * the build-side keys into the probe-side SCAN, so probe rows that
  * cannot match are dropped before the shuffle — at 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * matching slice. The size thresholds that gate injection are tuned for
  * real clusters (10 GB probe scans), so the spec lowers them to fixture
  * scale; production sessions keep the defaults. */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark._

  test("runtime bloom filter injects into the probe side of a filtered shuffle join") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val orders = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = Tables.lineitem(spark, sf)
      val joined = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("bloom_filter"),
        s"expected an injected bloom filter in:\n$optimized")
      // and the filtered result is still correct
      val n = joined.collect().head.getAs[Long]("n")
      val want = li.join(orders, li("l_orderkey") === orders("o_orderkey")).count()
      assert(n == want)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
