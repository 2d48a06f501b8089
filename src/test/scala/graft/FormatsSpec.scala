package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet (SURVEY.md §2.1): ORC, Avro,
  * JSON, CSV roundtrips must preserve row content. */
class FormatsSpec extends AnyFunSuite {
  import TestSpark._

  private def orders = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")

  private def roundtrip(fmt: String, writeOpts: Map[String, String] = Map.empty,
      readOpts: Map[String, String] = Map.empty): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"fmt_$fmt").toString + "/data"
    orders.write.options(writeOpts).format(fmt).save(dir)
    val back = spark.read.options(readOpts).format(fmt).load(dir)
    val a = orders.orderBy("o_orderkey").collect().map(_.toString)
    val b = back.select(orders.columns.map(col).toIndexedSeq: _*)
      .orderBy("o_orderkey").collect().map(_.toString)
    assert(a.sameElements(b), s"$fmt roundtrip diverged")
  }

  test("orc roundtrip preserves rows") { roundtrip("orc") }

  // no avro test: /opt/spark/jars ships only Apache Avro core
  // (avro-1.12.1), not the spark-avro datasource module

  test("json roundtrip preserves rows") {
    // json is schemaless on read: give it the schema to keep types
    val dir = java.nio.file.Files.createTempDirectory("fmt_json").toString + "/data"
    orders.write.format("json").save(dir)
    val back = spark.read.schema(orders.schema).format("json").load(dir)
    assert(back.orderBy("o_orderkey").collect().map(_.toString)
      .sameElements(orders.orderBy("o_orderkey").collect().map(_.toString)))
  }

  test("csv roundtrip with explicit schema preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("fmt_csv").toString + "/data"
    orders.write.option("header", true).format("csv").save(dir)
    val back = spark.read.option("header", true).schema(orders.schema).format("csv").load(dir)
    assert(back.orderBy("o_orderkey").collect().map(_.toString)
      .sameElements(orders.orderBy("o_orderkey").collect().map(_.toString)))
  }

  test("partitioned + compressed parquet sink honors layout") {
    val dir = java.nio.file.Files.createTempDirectory("fmt_part").toString + "/data"
    orders.withColumn("st", col("o_orderstatus"))
      .write.partitionBy("st").option("compression", "zstd").parquet(dir)
    val parts = new java.io.File(dir).list().filter(_.startsWith("st="))
    assert(parts.length == 3) // O, F, P
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
  }
}
