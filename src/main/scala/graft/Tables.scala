package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness test tables (FIXTURES.md §A).
  *
  * Parquet is self-describing, so no inference pass is needed (unlike the
  * reference's CSV `inferSchema=True` triple-scan —
  * linehaul_source_to_bronze.py:109-141). Each reader is a plain parquet
  * scan; Catalyst handles column pruning + predicate pushdown, so callers
  * should express projections/filters declaratively and let them reach the
  * scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp (PARQUET_TYPE_ILLEGAL). Read it as raw nanos and
    * truncate to microseconds — the same truncation DuckDB applies — so
    * both engines see identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
