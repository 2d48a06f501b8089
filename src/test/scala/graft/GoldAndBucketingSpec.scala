package graft

import graft.pipeline.{Gold, Medallion}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GoldAndBucketingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def silverClaims() = Seq(
    ("C1", "OPEN", "2024-01-10 00:00:00", 1000.0),
    ("C2", "CLOSED", "2024-01-20 00:00:00", 500.0),
    ("C3", "OPEN", "2024-02-05 00:00:00", 250.0))
    .toDF("claim_number", "status_code", "date_created", "total_amount")
    .withColumn("date_created", col("date_created").cast("timestamp"))

  test("gold claims mart: child rollups joined without row explosion") {
    val payments = Seq(("C1", 400.0), ("C1", 100.0), ("C3", 250.0))
      .toDF("claim_number", "payment_amount")
    val products = Seq(("C1", 900.0), ("C2", 450.0), ("C2", 50.0))
      .toDF("claim_number", "line_total")
    val mart = Gold.claimsMart(silverClaims(), payments, products)
      .orderBy("claim_number").collect()
    assert(mart.length == 3) // one row per claim, no fanout
    val c1 = mart(0)
    assert(c1.getAs[Long]("n_payments") == 2 && c1.getAs[Double]("total_paid") == 500.0)
    assert(c1.getAs[Long]("n_products") == 1 && c1.getAs[Double]("total_line_value") == 900.0)
    val c2 = mart(1)
    assert(c2.getAs[Long]("n_payments") == 0 && c2.getAs[Double]("total_paid") == 0.0)
  }

  test("gold monthly status rollup") {
    val out = Gold.monthlyStatus(silverClaims()).collect()
    assert(out.length == 3) // (Jan,OPEN), (Jan,CLOSED), (Feb,OPEN)
    assert(out.map(_.getAs[Long]("n_claims")).sum == 3)
  }

  test("explicit-schema csv read: deterministic types, no inference scan") {
    val tmp = java.nio.file.Files.createTempDirectory("csv").toString
    silverClaims().coalesce(1).write.option("header", true).csv(s"$tmp/c")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "claim_number STRING, status_code STRING, date_created TIMESTAMP, total_amount DOUBLE")
    val df = Medallion.readCsv(spark, s"$tmp/c", schema)
    assert(df.schema == schema)
    assert(df.count() == 3)
  }

  test("run report dataframe + failure gate") {
    val ok = Seq(Medallion.RunReport("claim", "db", 3, 1.2))
    assert(Medallion.reportDf(spark, ok).columns.sameElements(
      Seq("table", "database", "count", "execution_time_s")))
    Medallion.failOnEmpty(ok)
    assertThrows[IllegalArgumentException](
      Medallion.failOnEmpty(Seq(Medallion.RunReport("claim", "db", 0, 0.1))))
  }

  test("q77 plan prunes bronze partitions: non-empty PartitionFilters, pruned scan") {
    val df = operators.PipelineQueries.q77PartitionPruned(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(800))
    assert(!plan.matches("(?s).*PartitionFilters: \\[\\].*"),
      s"expected a pushed partition filter on year_month:\n${plan.take(1200)}")
    assert(plan.contains("year_month"), plan.take(800))
    // 12 month-partitions of 1996 → 12 distinct year_month values survive
    assert(df.count() == 12)
  }

  test("q78 bucketed join: SMJ + agg run with no hash-partition exchange") {
    val df = operators.PipelineQueries.q78BucketedJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join+agg must not shuffle:\n${plan.take(1500)}")
    assert(df.count() > 0)
  }

  test("bucketed tables sort-merge join with NO shuffle exchange") {
    val s2 = spark.newSession() // warehouse.dir is static; default ./spark-warehouse
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    import s2.implicits._
    val li = Tables.lineitem(s2, sf).select("l_orderkey", "l_extendedprice")
    val o = Tables.orders(s2, sf).select("o_orderkey", "o_orderpriority")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_b")
    val joined = s2.table("li_b").join(s2.table("o_b"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides bucketed on the join key -> no Exchange in the plan
    assert(plan.contains("SortMergeJoin"), plan.take(500))
    assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n${plan.take(800)}")
    assert(joined.count() == Tables.lineitem(s2, sf).count())
    s2.sql("DROP TABLE IF EXISTS li_b"); s2.sql("DROP TABLE IF EXISTS o_b")
  }
}
