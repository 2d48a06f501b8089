package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has runnable plan and every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q01 groups to the 6 TPC-H flag/status combos with positive counts") {
    val rows = operators.Relational.q01AggFilter(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("count_order") > 0))
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys.size == rows.length) // grouping keys unique
  }

  test("q03 broadcast join covers every brand present in lineitem") {
    val n = operators.Relational.q03JoinBroadcast(spark, sf).count()
    assert(n > 0 && n <= 25)
  }

  test("q06 semi-join returns subset of customers") {
    val semi = operators.Relational.q06JoinSemi(spark, sf).count()
    val all = Tables.customer(spark, sf).count()
    assert(semi <= all)
  }

  test("q07 anti-join + join partition customer-facing parts") {
    import org.apache.spark.sql.functions._
    val p = Tables.part(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val anti = operators.Relational.q07JoinAnti(spark, sf).count()
    val joined = p.join(li, p("p_partkey") === li("l_partkey"), "left_semi").count()
    assert(anti + joined == p.count())
  }

  test("q10 rollup has grand total row equal to table count") {
    import org.apache.spark.sql.functions._
    val df = operators.Relational.q10Rollup(spark, sf)
    val total = df.filter(col("rf") === "ALL" && col("ls") === "ALL")
      .collect().head.getAs[Long]("n")
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("q12 top-k is sorted descending and bounded") {
    val rows = operators.Relational.q12TopK(spark, sf).collect()
    assert(rows.length == 100)
    val prices = rows.map(_.getAs[Double]("l_extendedprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
