package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q108 SCD Type-2 and q109 unigram-LM quality — interval-algebra
  * invariants (data-independent) on the fixtures. */
class HistoryOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q108 intervals tile each user's history: contiguous, typed runs, one current") {
    val out = operators.HistoryOps.q108Scd2(spark, sf)
    val rows = out.collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getLong(1))
      // versions are 1..n contiguous
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      // exactly one open (current) interval, and it is the last version
      assert(sorted.count(_.getInt(6) == 1) == 1)
      assert(sorted.last.getInt(6) == 1 && sorted.last.isNullAt(4))
      // valid_to of version k equals valid_from of version k+1 (no gaps)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) == b.getTimestamp(3))
          // consecutive runs carry DIFFERENT attribute values (else no new version)
          assert(a.getString(2) != b.getString(2))
        case _ => ()
      }
    }
    // every event is accounted for exactly once
    val totalEvents = rows.map(_.getLong(5)).sum
    assert(totalEvents == Tables.events(spark, sf).count())
  }

  test("q132 PIT lookup: one row per error; state matches the interval-filter definition") {
    import org.apache.spark.sql.functions._
    val rows = operators.HistoryOps.q132PitLookup(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    assert(rows.length == ev.filter(col("event_type") === "error").count())
    // never an error state (dim excludes errors); 'none' only before any state
    assert(rows.forall(_.getAs[String]("state") != "error"))
    // cross-check a sample against the naive interval-filter semantics
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts")).limit(20).collect()
    val nonErr = ev.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("ts"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    errs.foreach { e =>
      val prior = nonErr.filter(x => x._1 == e.getLong(1) && !x._2.after(e.getTimestamp(2)))
      val expect = if (prior.isEmpty) "none" else prior.maxBy(_._2.getTime)._3
      val got = rows.find(_.getAs[Long]("event_id") == e.getLong(0)).get.getAs[String]("state")
      assert(got == expect, s"event ${e.getLong(0)}: got $got want $expect")
    }
  }

  test("q109 per-lang rollup partitions the corpus; flags within bounds") {
    val out = operators.Curation.q109UnigramQuality(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    out.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= r.getLong(1)) // n_flagged
      assert(r.getDouble(3) <= r.getDouble(2)) // min <= avg
      assert(r.getDouble(2) < 0.0) // log-probs are negative
    }
  }
}
