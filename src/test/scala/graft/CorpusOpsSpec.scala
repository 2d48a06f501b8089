package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the corpus-preparation tier (q114/q115/q116).
  * Value parity is the DuckDB oracle gate's job. */
class CorpusOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q114 paragraph dedup: counts partition; the corpus loses paragraphs, no doc gains any") {
    val rows = CorpusOps.q114ParagraphDedup(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") == r.getAs[Long]("n_paras"))
      assert(r.getAs[Long]("n_paras") > 0)
    }
    // keep-first: the globally first doc (doc_id 0) can never lose its
    // first paragraph to another doc, and total kept ≤ total paragraphs
    val d0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(d0.getAs[Long]("n_kept") >= 1)
    spark.catalog.clearCache()
  }

  test("q114 keep-first is idempotent: deduped paragraph multiset has no duplicates") {
    // every kept paragraph is kept exactly once corpus-wide: the number
    // of kept paragraphs equals the number of distinct paragraphs
    val blocks = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.Portable.tokens(col("text")).as("tl"))
      .select(posexplode(expr(
        s"transform(sequence(0, cast(floor((size(tl)-1)/${CorpusOps.ParaLen}) as int)), i -> array_join(slice(tl, i*${CorpusOps.ParaLen}+1, ${CorpusOps.ParaLen}), ' '))"))
        .as(Seq("idx", "para")))
    val distinctParas = blocks.select(col("para")).distinct().count()
    val totalKept = CorpusOps.q114ParagraphDedup(spark, sf)
      .agg(sum(col("n_kept"))).collect()(0).getLong(0)
    assert(totalKept == distinctParas)
    spark.catalog.clearCache()
  }

  test("q115 SemDeDup: membership partitions; every embedding lands in exactly one cell") {
    val rows = CorpusOps.q115SemanticDedup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") == r.getAs[Long]("n_members"))
      assert(r.getAs[Long]("n_kept") >= 1) // lowest id of a cell is never removed
    }
    val nVecs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 16).count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == nVecs)
    spark.catalog.clearCache()
  }

  test("q147 trained SemDeDup: k is data-derived; membership partitions; overlap bounded") {
    val rows = CorpusOps.q147SemanticDedupTrained(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).filter(col("vec_id") >= 16).count()
    val expK = math.max(4, math.min(64,
      math.ceil(nVecs / CorpusOps.SemDedupCellSize.toDouble).toInt))
    // audit lists non-empty cells only: at most k rows, at least one
    assert(rows.nonEmpty && rows.length <= expK)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") == r.getAs[Long]("n_members"))
      assert(r.getAs[Long]("n_kept") >= 1)
      // overlap is an intersection: never exceeds either removed set
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_removed_trained"))
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_removed_fixed"))
    }
    assert(rows.map(_.getAs[Long]("n_members")).sum == nVecs)
    spark.catalog.clearCache()
  }

  test("q117 random projection: compression keeps cosine within JL distortion") {
    val rows = graft.operators.PqOps.q117RandomProjection(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // 64→16 dims with tau spread ~1/sqrt(16): distortion is bounded but
      // non-trivial; a broken sign matrix shows up as |diff| ≈ |cos64|
      assert(r.getAs[Double]("max_abs_diff") < 0.9)
      assert(r.getAs[Long]("n_pairs") > 0)
    }
    // pairs are consecutive ids: exactly n-1 across all labels
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == n - 1)
  }

  test("q118 length batching: batches partition each stream; padding never negative") {
    val rows = graft.operators.CorpusOps.q118LengthBatching(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= CorpusOps.BatchDocs)
      assert(r.getAs[Long]("pad_waste") >= 0)
      assert(r.getAs[Long]("max_tok") * r.getAs[Long]("n_docs") >= r.getAs[Long]("sum_tok"))
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
    // only the last batch of a stream may be short
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_.getAs[Long]("batch_id"))
      sorted.dropRight(1).foreach(b =>
        assert(b.getAs[Long]("n_docs") == CorpusOps.BatchDocs))
    }
  }

  test("q121 tolerant parse: corrupt = malformed only, never valid-but-field-missing") {
    import spark.implicits._
    val rows = graft.operators.Scalars.q121TolerantParse(spark, sf).collect()
    val (nRows, nCorrupt) =
      (rows.map(_.getAs[Long]("n_rows")).sum, rows.map(_.getAs[Long]("n_corrupt")).sum)
    // exactly the event_id % 7 == 0 slice is corrupted
    val expected = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_id") % 7 === 0).count()
    assert(nCorrupt == expected && nCorrupt > 0 && nCorrupt < nRows)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_parsed") + r.getAs[Long]("n_corrupt") == r.getAs[Long]("n_rows")))
    // the disambiguation the _corrupt_record column exists for: a VALID
    // record missing the field parses with k null, corrupt stays null
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("k BIGINT, _corrupt_record STRING")
    val probe = Seq("""{"x": 1}""", """{"k": 5""", """{"k": 7}""").toDF("raw")
      .select(from_json(col("raw"), schema,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")).as("p"))
      .select(col("p.k").as("k"), col("p._corrupt_record").isNotNull.as("corrupt"))
      .collect()
    assert(probe(0).isNullAt(0) && !probe(0).getBoolean(1)) // valid, field missing
    assert(probe(1).getBoolean(1))                           // malformed
    assert(probe(2).getLong(0) == 7L && !probe(2).getBoolean(1))
  }

  test("q127 percentile trim: band is ordered, trim fraction is ~10% by construction") {
    val rows = graft.operators.CorpusOps.q127PercentileTrim(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      assert(p05 <= p95)
      val (n, trim) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_trim"))
      // values strictly outside the interpolated band: at most
      // floor(0.05*(n-1)) + 1 per tail (quantile_cont at position p*(n-1))
      val tailMax = math.floor(0.05 * (n - 1)).toLong + 1
      assert(trim <= 2 * tailMax)
    }
  }

  test("q128 argmax keep: winner has the group max length; unique-key tiebreak is by doc_id") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.CorpusOps.q128ArgmaxKeep(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val grp = docs.filter(_._1 == src)
      val maxLen = grp.map(_._3).max
      assert(r.getAs[Long]("max_chars") == maxLen)
      // the kept doc is the max-length doc with the LARGEST doc_id
      val expected = grp.filter(_._3 == maxLen).map(_._2).max
      assert(r.getAs[Long]("keep_doc") == expected)
    }
  }

  test("q120 source KL: divergence is non-negative (Gibbs); entropy bounded by ln(vocab)") {
    val rows = graft.operators.CorpusOps.q120SourceKl(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // 6dp term rounding can push an exactly-zero KL a hair negative;
      // anything beyond rounding noise means the distributions are wrong
      assert(r.getAs[Double]("kl_vs_corpus") > -1e-4)
      assert(r.getAs[Double]("entropy") >= 0.0)
      assert(r.getAs[Double]("entropy") <=
        math.log(r.getAs[Long]("n_vocab").toDouble) + 1e-4)
      assert(r.getAs[Long]("n_vocab") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("q119 z-order: each z-bucket covers a tight rectangle in BOTH dims") {
    val zb = graft.operators.ScaleOps.ZBits
    val rows = graft.operators.ScaleOps.q119ZorderLayout(spark, sf).collect()
    // fixing the top ZBits of z fixes the top ZBits/2 bits of each dim:
    // every bucket's rectangle spans at most 2^(ZBits/2) per side — the
    // two-dimensional locality a single-column sort cannot give
    val side = 1L << (zb / 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") < side)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") < side)
      assert(r.getAs[Long]("span_area") <= side * side)
    }
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      Tables.orders(spark, sf).count())
  }

  test("q116 chunking: windows tile every token; only the last chunk of a doc is short") {
    val chunks = CorpusOps.q116DocChunk(spark, sf).collect()
    val perDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    val docLens = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.functions.Portable.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      val n = docLens(docId)
      sorted.zipWithIndex.foreach { case (c, i) =>
        val expected = math.min(CorpusOps.ChunkLen.toLong, n - i.toLong * CorpusOps.ChunkStride)
        assert(c.getAs[Long]("n_chunk_tok") == expected, s"doc $docId chunk $i")
      }
      // last chunk starts inside the doc (no empty windows); one more
      // window would start at or past the end — together: full tiling
      assert((sorted.length - 1).toLong * CorpusOps.ChunkStride < n)
      assert(sorted.length.toLong * CorpusOps.ChunkStride >= n)
    }
  }
}
