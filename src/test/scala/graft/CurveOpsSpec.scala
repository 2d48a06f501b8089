package graft

import graft.operators.CurveOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the curve/hygiene tier (q265–q267). */
class CurveOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q265: cumulative shares are monotone from the best band and end at 1") {
    val r = CurveOps.q265ValueCurve(spark, sf).collect()
    assert(r.nonEmpty)
    val desc = r.sortBy(-_.getLong(0)) // best band first
    val ds = desc.map(_.getLong(3))
    val ts = desc.map(_.getLong(4))
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    assert(ds.last == 1000000L && ts.last == 1000000L)
    assert(r.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
  }

  test("q266: OOF encoding never uses a row's own fold") {
    val r = CurveOps.q266OofEncode(spark, sf)
    assert(r.count() == Tables.orders(spark, sf).count())
    // two rows of the same category in DIFFERENT folds get different
    // encodings whenever the folds' label mixes differ — and the same
    // encoding when they share a fold
    val sameCatDiff = r.groupBy(col("cat"))
      .agg(countDistinct(col("fold")).as("nf"),
        countDistinct(col("enc_oof_micro")).as("ne"))
      .filter(col("nf") > 1)
    assert(sameCatDiff.count() > 0)
    // encoding per (cat, fold) is constant
    val perCell = r.groupBy(col("cat"), col("fold"))
      .agg(countDistinct(col("enc_oof_micro")).as("ne"))
    assert(perCell.filter(col("ne") =!= 1).count() == 0)
  }

  test("q267: a hash shuffle shows only sampling noise, not clumping") {
    val r = CurveOps.q267ShuffleAudit(spark, sf).collect()
    assert(r.length <= CurveOps.ShuffleBuckets)
    assert(r.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    // total χ² ≈ its degrees of freedom for a clean shuffle:
    // df = (B−1)(L−1); allow a generous 3× envelope
    val totalChi = r.map(_.getLong(2)).sum / 1e9
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    val df = (r.length - 1).toDouble * (langs - 1)
    assert(totalChi < df * 3,
      s"chi2 $totalChi vs df $df — hash shuffle must not clump languages")
  }
}
