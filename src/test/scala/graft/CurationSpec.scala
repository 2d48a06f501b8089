package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Curation operators (q86 decontamination, q87 repetition rules,
  * q88 source-quota mix) — invariants on the fixture tables plus
  * planted-input checks on synthetic `documents.parquet` dirs (the
  * queries read `$dir/documents.parquet`, so a temp dir with a crafted
  * table exercises exact expected values without data-dependent
  * assertions on the fixtures). */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    val data = rows.map { case (id, t, l, src) => Row(id, t, l, src, t.length.toLong) }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q86 planted contamination: verbatim 8-gram run is flagged, clean docs are not") {
    val run = (1 to 12).map(i => s"w$i").mkString(" ") // 12-token verbatim run
    val dir = writeDocs(Seq(
      (0L, s"alpha beta $run gamma", "en", "src0"),          // bench (0 % 29 == 0)
      (1L, s"x y z $run q r", "en", "src1"),                 // train: contains the run
      (2L, "totally different words here nothing shared at all", "en", "src2"),
      (29L, "another clean bench document with unique tokens only", "en", "src3")))
    val out = operators.Curation.q86Decontaminate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    // bench 0: train doc 1 shares 12-8+1=5 distinct 8-grams >= ContamMinShared
    assert(out === Seq((0L, 1L, 5L, 1), (29L, 0L, 0L, 0)))
  }

  test("q86 fixture invariants: anchored on the full bench set") {
    val docs = Tables.documents(spark, sf)
    val nBench = docs.filter(col("doc_id") % 29 === 0).count()
    val out = operators.Curation.q86Decontaminate(spark, sf).collect()
    assert(out.length.toLong == nBench)
    out.foreach { r =>
      val (n, mx, flag) = (r.getLong(1), r.getLong(2), r.getInt(3))
      assert(flag == (if (n > 0) 1 else 0))
      assert((n == 0) == (mx == 0))
      assert(mx == 0 || mx >= operators.Curation.ContamMinShared)
    }
  }

  test("q87 planted repetition: exact metrics for a degenerate doc") {
    // doc 0: "a a a a" -> top_frac=1.0, dup2_frac=1-1/3, distinct_ratio=0.25
    // doc 1: ten distinct words -> 0.1 / 0.0 / 1.0 (passes all three rules)
    val dir = writeDocs(Seq(
      (0L, "a a a a", "en", "s0"),
      (1L, "one two three four five six seven eight nine ten", "fr", "s1")))
    val rows = operators.Curation.q87Repetition(spark, dir).collect()
    val en = rows.find(_.getString(0) == "en").get
    assert(en.getDouble(2) == 1.0)                  // avg_top_frac
    assert(math.abs(en.getDouble(3) - (1.0 - 1.0 / 3)) < 1e-6) // avg_dup2_frac
    assert(en.getDouble(4) == 0.25)                 // avg_distinct_ratio
    assert(en.getLong(5) == 1 && en.getLong(6) == 1 && en.getLong(7) == 1)
    assert(en.getLong(8) == 0)                      // n_pass_all
    val fr = rows.find(_.getString(0) == "fr").get
    assert(fr.getDouble(3) == 0.0 && fr.getDouble(4) == 1.0 && fr.getLong(8) == 1)
  }

  test("q87 fixture invariants: partition of the corpus, fractions in range") {
    val out = operators.Curation.q87Repetition(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == total)
    out.foreach { r =>
      Seq(2, 3, 4).foreach(i => assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0))
      Seq(5, 6, 7, 8).foreach(i => assert(r.getLong(i) >= 0 && r.getLong(i) <= r.getLong(1)))
    }
  }

  test("q88 quotas: n_kept = min(quota, n_total), ids listed exactly") {
    val out = operators.Curation.q88SourceMix(spark, sf).collect()
    out.foreach { r =>
      val (total, quota, kept, ids) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      assert(kept == math.min(quota, total))
      val listed = if (ids.isEmpty) 0 else ids.split(",").length
      assert(listed.toLong == kept)
    }
    // deterministic: a second run selects the identical id sets
    val again = operators.Curation.q88SourceMix(spark, sf).collect()
    assert(out.map(_.getString(4)).toSeq == again.map(_.getString(4)).toSeq)
  }

  test("q110 packing conserves tokens; packs are contiguous per lang") {
    val out = operators.Curation.q110SeqPack(spark, sf).collect()
    val totalTokens = Tables.documents(spark, sf)
      .select(size(graft.functions.Portable.tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(out.map(_.getLong(3)).sum == totalTokens)
    // contiguity holds iff every doc is shorter than PackLen (a longer doc
    // straddles whole windows and legitimately skips pack ids) — guard on
    // that precondition instead of assuming fixture shape
    val maxDoc = Tables.documents(spark, sf)
      .select(max(size(graft.functions.Portable.tokens(col("text"))))).collect()(0).getInt(0)
    if (maxDoc < operators.Curation.PackLen) {
      out.groupBy(_.getString(0)).foreach { case (_, packs) =>
        val ids = packs.map(_.getLong(1)).sorted
        assert(ids.head == 0L && ids.toSeq == (0L until ids.length))
      }
    }
  }

  test("q154 bigram LM: log-probs negative, bigram count conserves positions") {
    val out = operators.Curation.q154BigramQuality(spark, sf).collect()
    assert(out.nonEmpty)
    // probabilities < 1 ⇒ both score columns strictly negative, avg ≥ min
    out.foreach { r =>
      val avg = r.getAs[Double]("avg_logprob2")
      val mn = r.getAs[Double]("min_logprob2")
      assert(avg < 0.0 && mn < 0.0 && avg >= mn)
    }
    // Σ n_bigrams = Σ max(tokens-1, 0) over docs with ≥ 2 tokens
    val expected = Tables.documents(spark, sf)
      .select(greatest(size(graft.functions.Portable.tokens(col("text"))) - 1, lit(0))
        .cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(out.map(_.getAs[Long]("n_bigrams")).sum == expected)
    spark.catalog.clearCache()
  }
}

/** q89 product quantization: when corpus vectors are verbatim copies of
  * codebook entries, quantization is lossless and ADC equals the exact
  * query-to-vector distance — pinning the encode and lookup paths hard. */
class PqSpec extends AnyFunSuite {
  import TestSpark._
  import operators.PqOps

  private def writeEmb(vecs: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = vecs.map { case (id, v, l) => Row(id, v.toSeq, l) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(64)(i => math.sin(seed * 64 + i).toFloat)

  test("lossless corpus: ADC == exact distance, top-5 == exact top-5") {
    // codebook donors 0..15; corpus 16..31 are verbatim copies of them
    val donors = (0L until 16L).map(id => (id, vec(id.toInt), 0))
    val corpus = (16L until 32L).map(id => (id, vec((id - 16).toInt), 0))
    val dir = writeEmb(donors ++ corpus)
    val out = PqOps.q89PqAdc(spark, dir).collect()
    assert(out.length == 8 * 5) // 8 queries (vec_id < 8) x top-5
    // exact distances, same double arithmetic
    val exact = for {
      q <- 0 until 8; c <- 0 until 16
    } yield ((q.toLong, (c + 16).toLong),
      vec(q).zip(vec(c)).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) })
    val exactMap = exact.toMap
    out.foreach { r =>
      val (qid, cid, adc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(math.abs(adc - exactMap((qid, cid))) < 1e-6,
        s"ADC should be exact for lossless corpus: q$qid c$cid")
    }
    // per-query ranks strictly ordered by the exact distance
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getDouble(2)).toSeq == sorted.map(_.getDouble(2)).sorted.toSeq)
    }
  }

  test("fixture invariants: 5 candidates per query, ranks contiguous") {
    val out = PqOps.q89PqAdc(spark, sf).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to 5))
      rows.foreach(r => assert(r.getLong(1) >= PqOps.Ks)) // corpus only
    }
  }

  test("q141 funnel: stage counts decrease monotonically; yield bounded by kept docs") {
    val r = operators.Curation.q141CurationFunnel(spark, sf).collect()(0)
    val seq = Seq("n_total", "n_len", "n_quality", "n_rep", "n_kept")
      .map(r.getAs[Long])
    assert(seq == seq.sorted.reverse, s"funnel not monotone: $seq")
    assert(seq.head == Tables.documents(spark, sf).count())
    assert(seq.last > 0, "pipeline kept nothing — thresholds degenerate")
    assert(seq.last < seq.head, "pipeline filtered nothing — thresholds degenerate")
    // every kept doc has n_chars in the length band, so the yield is
    // bounded by band edges times the kept count
    val yieldChars = r.getAs[Long]("chars_yield")
    assert(yieldChars >= 100 * seq.last && yieldChars <= 500 * seq.last)
  }
}
