package graft

import graft.operators.SurvivalOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the survival-analysis tier (q272). */
class SurvivalOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q272: at-risk counts telescope and log-survival is non-increasing") {
    val r = SurvivalOps.q272SurvivalKm(spark, sf).collect()
    assert(r.nonEmpty)
    val sorted = r.sortBy(_.getLong(0))
    // n_risk at the first time equals the full cohort
    val viewers = Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(sorted.head.getLong(1) == viewers)
    // telescoping: next n_risk = n_risk − conv − cens
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) <= a.getLong(1) - a.getLong(2) - a.getLong(3),
          "at-risk can only shrink by the subjects who left")
      case _ =>
    }
    // everyone leaves exactly once
    assert(sorted.map(x => x.getLong(2) + x.getLong(3)).sum == viewers)
    // log-survival is non-increasing (survival never goes up)
    val lnS = sorted.map(_.getLong(5))
    assert(lnS.zip(lnS.tail).forall { case (a, b) => b <= a })
    assert(lnS.forall(_ <= 0))
    // hazards are probabilities
    sorted.foreach(row => assert(row.getLong(4) >= 0 && row.getLong(4) <= 1000000L))
  }
}
