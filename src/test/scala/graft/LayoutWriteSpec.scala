package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The write-path half of the z-order story: q119 verifies bounded cells
  * on the COMPUTED curve; this spec actually WRITES the layout
  * (`repartitionByRange(z).sortWithinPartitions(z)` — SCALING.md's
  * recipe) and proves the property scans care about: every produced
  * parquet FILE covers a bounded box in BOTH dimensions, so min/max
  * footer stats prune on either predicate. A single-column sort is the
  * control: its files span (nearly) the full range of the other
  * dimension. */
class LayoutWriteSpec extends AnyFunSuite {
  import TestSpark._

  private val files = 8
  private val bits = 8 // 256×256 key grid, matches q119

  private def perFileSpans(dir: String): Array[(Long, Long)] = {
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val one = spark.read.parquet(f.toString)
          .agg(min("xb").as("nx"), max("xb").as("xx"),
            min("yb").as("ny"), max("yb").as("xy"))
          .head()
        (one.getLong(1) - one.getLong(0) + 1, one.getLong(3) - one.getLong(2) + 1)
      }
  }

  test("z-ordered files bound BOTH dims; linear sort leaves one dim unbounded") {
    val n = 1 << bits
    val src = Tables.orders(spark, sf)
      .select(pmod(col("o_custkey"), lit(n)).cast("long").as("xb"),
        pmod(month(col("o_orderdate")) - 1 + (year(col("o_orderdate")) - 1995) * 12,
          lit(n)).cast("long").as("yb"))
      .withColumn("z", ScaleOps.mortonZ(col("xb"), col("yb")))
    val root = java.nio.file.Files.createTempDirectory("zorder_write")

    val zDir = s"$root/zorder"
    src.repartitionByRange(files, col("z")).sortWithinPartitions(col("z"))
      .write.parquet(zDir)
    val lDir = s"$root/linear"
    src.repartitionByRange(files, col("xb")).sortWithinPartitions(col("xb"))
      .write.parquet(lDir)

    val zSpans = perFileSpans(zDir)
    val lSpans = perFileSpans(lDir)
    assert(zSpans.length >= files / 2 && lSpans.nonEmpty)
    // bounds derive from the DATA's occupied ranges (the fixture's month
    // counter occupies well under the 256-slot grid at small SFs)
    val rng = src.agg(
      (max("xb") - min("xb") + 1).as("fx"),
      (max("yb") - min("yb") + 1).as("fy")).head()
    val (fullX, fullY) = (rng.getLong(0), rng.getLong(1))
    // the pruning statement: a point predicate on dim D touches every
    // file whose D-range covers the point — expected files touched
    // E_D = Σ_files span_D/full_D. A single-column sort is optimal on
    // its sort dim (E_x ≈ 1) and pessimal on the other (E_y ≈ #files);
    // z-order's value is balancing BOTH, so the judged metric is the
    // WORST dimension. Range-partition boundaries at arbitrary
    // z-quantiles can straddle curve regions, so per-file bounds are
    // loose — the aggregate is the guarantee.
    def expected(spans: Array[(Long, Long)]): (Double, Double) =
      (spans.map(_._1.toDouble / fullX).sum, spans.map(_._2.toDouble / fullY).sum)
    val (zEx, zEy) = expected(zSpans)
    val (lEx, lEy) = expected(lSpans)
    assert(math.max(zEx, zEy) < math.max(lEx, lEy) * 0.75,
      s"z worst-dim expected files ${math.max(zEx, zEy)} should beat " +
        s"linear ${math.max(lEx, lEy)}")
    // the linear control: some file's y spans ~the whole occupied range
    val maxLy = lSpans.map(_._2).max
    assert(maxLy >= fullY * 3 / 4,
      s"control failed: linear-sorted files unexpectedly bound y ($maxLy of $fullY)")
    // and the z layout's worst y-span must beat the linear layout's
    assert(zSpans.map(_._2).max < maxLy)
  }
}
