package graft

import graft.pipeline.{Medallion, RenameMaps, TableConfig}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.3) using raw ScalaCheck
  * generators sampled over fixed seeds (the scalatest bridge isn't in the
  * offline cache): PK-dedup laws, rename bijection, portable-hash
  * stability. */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rowGen: Gen[List[(String, Int, Double)]] =
    Gen.listOfN(60, for {
      key <- Gen.choose(0, 8)
      version <- Gen.choose(0, 1000)
      payload <- Gen.choose(-1e6, 1e6)
    } yield (s"K$key", version, payload))

  test("dedupByPk: unique keys out, each kept row carries its key's max version") {
    samples(rowGen, 6).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("pk", "version", "payload")
      val out = Medallion.dedupByPk(df,
        TableConfig("t", Seq("pk"), Seq("version"))).collect()
      val keys = out.map(_.getString(0))
      assert(keys.distinct.length == keys.length)
      val maxByKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      out.foreach(r => assert(r.getInt(1) == maxByKey(r.getString(0))))
      assert(keys.toSet == rows.map(_._1).toSet)
    }
  }

  test("applyRenames: bijective on present columns, no column lost or gained") {
    val presentGen = Gen.someOf(RenameMaps.claim.keys.toSeq).map(_.toList)
    samples(presentGen, 8).filter(_.nonEmpty).foreach { cols =>
      val df = cols.zipWithIndex
        .foldLeft(Seq(1).toDF("__seed")) { case (d, (c, i)) => d.withColumn(c, lit(i)) }
        .drop("__seed")
      val out = Medallion.applyRenames(df, RenameMaps.merged)
      assert(out.columns.length == df.columns.length)
      assert(out.columns.toSet == cols.map(RenameMaps.claim).toSet)
    }
  }

  test("polyHash: stable, in [0, P), equals the reference fold for random ASCII strings") {
    val strGen = Gen.listOfN(20, Gen.listOfN(12, Gen.alphaNumChar).map(_.mkString))
    samples(strGen, 4).filter(_.nonEmpty).foreach { strs =>
      val got = strs.distinct.toDF("s")
        .select(graft.functions.Portable.polyHash(col("s")).as("h"), col("s"))
        .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
      strs.foreach { s =>
        val expect = s.foldLeft(0L)((a, c) => (a * 31 + c) % graft.functions.Portable.P)
        assert(got(s) == expect && expect >= 0 && expect < graft.functions.Portable.P)
      }
    }
  }
}
