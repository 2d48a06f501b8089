package graft

import graft.sources.{FixedWidth, FwScanBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, StringEndsWith}
import org.apache.spark.sql.types.{LongType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The custom DataSourceV2 fixed-width reader: round-trip value parity,
  * filter pushdown (supported shapes accepted into the scan, unsupported
  * ones left residual without losing correctness), and column pruning
  * reaching the parser. */
class FixedWidthSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("fw_src").toString
    Tables.lineitem(spark, sf).select(concat(
        lpad(col("l_orderkey").cast("string"), 12, "0"),
        lpad(col("l_partkey").cast("string"), 12, "0"),
        lpad(col("l_quantity").cast("long").cast("string"), 4, "0"),
        col("l_returnflag")).as("value"))
      .write.mode("overwrite").text(dir)
    dir
  }
  private val fieldSpec =
    "l_orderkey:12:long,l_partkey:12:long,qty:4:long,flag:1:string"

  private def read(dir: String) = spark.read
    .format("graft.sources.FixedWidthSource")
    .option("path", dir).option("fields", fieldSpec).load()

  test("round-trip: every row and value survives format -> parse") {
    val dir = writeFixture()
    val got = read(dir)
      .orderBy(col("l_orderkey"), col("l_partkey"), col("qty"), col("flag"))
      .collect()
    val expect = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast("long").as("qty"), col("l_returnflag").as("flag"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("qty"), col("flag"))
      .collect()
    assert(got.length == expect.length)
    assert(got.map(_.toString).sameElements(expect.map(_.toString)))
  }

  test("supported filters push into the scan; unsupported stay residual") {
    val fields = FixedWidth.parseFields(fieldSpec)
    val b = new FwScanBuilder("/unused", fields)
    val residual = b.pushFilters(Array(
      EqualTo("flag", "R"), GreaterThanOrEqual("qty", 25L),
      StringEndsWith("flag", "R")))
    assert(b.pushedFilters().toSeq ==
      Seq(EqualTo("flag", "R"), GreaterThanOrEqual("qty", 25L)))
    assert(residual.toSeq == Seq(StringEndsWith("flag", "R")),
      "EndsWith has no fixed-width fast path; Spark must re-apply it")
  }

  test("pushed and residual filters both produce correct results end-to-end") {
    val dir = writeFixture()
    val pushedDown = read(dir)
      .filter(col("flag") === "R" && col("qty") >= 25).count()
    val residualOnly = read(dir)
      .filter(col("flag").endsWith("R") && col("qty") >= 25).count()
    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R" &&
        col("l_quantity").cast("long") >= 25).count()
    assert(pushedDown == expect)
    assert(residualOnly == expect)
    // the pushdown is visible in the physical plan via the scan description
    val plan = read(dir).filter(col("flag") === "R")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("FixedWidth"),
      s"scan node missing from:\n$plan")
  }

  test("DSv2 write commits atomically: temp files renamed, overwrite truncates") {
    val dir = java.nio.file.Files.createTempDirectory("fw_write").toString + "/out"
    val src = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast("long").as("qty"), col("l_returnflag").as("flag"))
    def writeOnce(): Unit = src.write
      .format("graft.sources.FixedWidthSource")
      .option("path", dir).option("fields", fieldSpec)
      .mode("overwrite").save()
    writeOnce()
    writeOnce() // second overwrite must truncate, not duplicate
    val back = read(dir)
    assert(back.count() == src.count(), "overwrite truncated the previous commit")
    val got = back.orderBy(col("l_orderkey"), col("l_partkey"), col("qty"), col("flag"))
      .collect().map(_.toString)
    val expect = src.orderBy(col("l_orderkey"), col("l_partkey"), col("qty"), col("flag"))
      .collect().map(_.toString)
    assert(got.sameElements(expect))
    // committed files carry the driver-assigned names; no task temp files remain
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
    assert(names.forall(_.matches("part-\\d{5}\\.fw")), names.mkString(","))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "_tmp")) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(dir + "_tmp")).isEmpty,
      "no stray task temp files after commit")
  }

  test("column pruning reaches the parser: only requested slices are parsed") {
    val fields = FixedWidth.parseFields(fieldSpec)
    val b = new FwScanBuilder("/unused", fields)
    b.pruneColumns(StructType(Seq(
      org.apache.spark.sql.types.StructField("qty", LongType))))
    val scan = b.build()
    assert(scan.readSchema().fieldNames.toSeq == Seq("qty"))
    // and a projection-only query through the source returns the right sums
    val dir = writeFixture()
    val got = read(dir).agg(sum(col("qty"))).collect().head.getLong(0)
    val expect = Tables.lineitem(spark, sf)
      .agg(sum(col("l_quantity").cast("long"))).collect().head.getLong(0)
    assert(got == expect)
  }
}
