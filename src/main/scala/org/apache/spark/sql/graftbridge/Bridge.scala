package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Minimal bridge into `private[sql]` surface, the established pattern for
  * Spark-native extension libraries: building a DataFrame from a custom
  * LogicalPlan and reading a Column's expression have no public
  * equivalents in Spark 4's split Column API.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  def planOf(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataFrame].queryExecution.analyzed

  def exprOf(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[CSparkSession].expression(c)
}
