package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold layer — the marts the reference's README declares as
  * "[Coming soon]" (README.md "Gold Layer"). Built from silver tables
  * (snake_case, deduped) the way the medallion model intends: claims
  * joined to their child tables on the declared key `claim_number`
  * (config.py:36-72), aggregated into an analysis-ready mart.
  */
object Gold {

  /** Claims mart: one row per claim with payment/product rollups.
    * Child aggregates are pre-grouped BEFORE the join (map-side partial
    * agg + child shuffles bounded by claim cardinality), then joined on
    * the shared key — never an exploded claim×payments×products row set. */
  def claimsMart(claim: DataFrame, payments: DataFrame, products: DataFrame): DataFrame = {
    val pay = payments.groupBy(col("claim_number"))
      .agg(
        count(lit(1)).as("n_payments"),
        graft.operators.Det.dsum(col("payment_amount")).as("total_paid"))
    val prod = products.groupBy(col("claim_number"))
      .agg(
        count(lit(1)).as("n_products"),
        graft.operators.Det.dsum(col("line_total")).as("total_line_value"))
    claim
      .join(pay, Seq("claim_number"), "left")
      .join(prod, Seq("claim_number"), "left")
      .na.fill(0L, Seq("n_payments", "n_products"))
      .na.fill(0.0, Seq("total_paid", "total_line_value"))
  }

  /** Monthly claim volumes/value per status — the reporting rollup. */
  def monthlyStatus(claim: DataFrame): DataFrame =
    claim
      .withColumn("month", trunc(col("date_created"), "month"))
      .groupBy(col("month"), col("status_code"))
      .agg(
        count(lit(1)).as("n_claims"),
        graft.operators.Det.dsum(col("total_amount")).as("claim_value"))
      .orderBy(col("month"), col("status_code"))
}
