package graft

import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RewriteDotProduct optimizer rule: HOF dot products written against
  * the portable API must execute as the codegen DotProductF expression —
  * with identical results. (The rule is installed here via the public
  * `experimental.extraOptimizations` hook because `getOrCreate` reuses the
  * shared test session; Verify/Bench install the same rule through
  * `spark.sql.extensions=graft.plans.GraftExtensions` on their own JVMs.) */
class RewriteRuleSpec extends AnyFunSuite {
  import TestSpark._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(graft.plans.RewriteDotProduct)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("portable HOF dot product is rewritten to DotProductF and results match") {
    val mk = () => Tables.embeddings(spark, sf)
      .select(col("vec_id"), Portable.dot(col("embedding"), col("embedding")).as("d2"))
    val hof = mk().orderBy(col("vec_id")).collect() // rule not installed
    withRule {
      val df = mk()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("dotproductf"),
        s"expected DotProductF in optimized plan:\n$optimized")
      val nat = df.orderBy(col("vec_id")).collect()
      assert(hof.map(_.getDouble(1)).sameElements(nat.map(_.getDouble(1))))
    }
  }

  test("non-matching aggregate shapes are left untouched") {
    import spark.implicits._
    withRule {
      val df = Seq(Seq(1, 2, 3)).toDF("xs")
        .select(expr("aggregate(xs, 0, (a, x) -> a + x)").as("s"))
      assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproductf"))
      assert(df.head().getInt(0) == 6)
    }
  }

  test("GraftExtensions is loadable by class name (the spark.sql.extensions path)") {
    val cls = Class.forName("graft.plans.GraftExtensions")
    assert(classOf[Function1[_, _]].isAssignableFrom(cls))
  }
}
