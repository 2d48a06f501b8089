package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join operator (logical node + strategy + exec). */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("q94 plans through AsOfJoinExec and equals the window-composed q26") {
    val df = operators.Advanced.q94AsOfNative(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val native = df.collect().map(_.toString).sorted
    val composed = operators.Advanced.q26AsOfJoin(spark, sf).collect().map(_.toString).sorted
    assert(native.sameElements(composed))
  }

  test("as-of join handles keys with no match (nulls) and tie timestamps") {
    import spark.implicits._
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "t_us", "tag")
    val right = Seq((1L, 100L, "r_tie"), (1L, 150L, "r_mid"), (3L, 10L, "r_other"))
      .toDF("k", "t_us", "rtag")
    val out = graft.plans.AsOf.join(spark, left, right, "k", "t_us")
      .toDF("k", "t_us", "tag", "rk", "rt", "rtag")
      .select("tag", "rtag").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("l1") == "r_tie")  // tie: rightTime <= leftTime includes equality
    assert(out("l2") == "r_mid")  // latest at-or-before wins
    assert(out("l3") == null)     // key 2 has no right rows -> nulls
  }
}
