package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic primitives for the LLM-data-pipeline operators
  * (dedup, similarity, text analysis).
  *
  * Each primitive exists twice: as a Spark `Column` builder and as a
  * DuckDB SQL fragment builder producing *bit-identical* results — pure
  * integer arithmetic (polynomial hashing, min-hash, sim-hash bits) or
  * IEEE double ops applied in an identical sequential order. That is what
  * lets MinHash/SimHash/cosine queries be hash-checked against the DuckDB
  * oracle rather than falling back to rows-only checks.
  *
  * Scale note: these are higher-order-function expressions — evaluated on
  * the executors inside a single projection (no shuffle, no UDF
  * serialization). For the 100 TB hot path the same signatures can be
  * swapped to `xxhash64`-based variants (codegen'd, ~10× faster, not
  * oracle-portable); see TextOps.q90* for those.
  */
object Portable {
  /** Modulus for all polynomial hashing (fits products in a long). */
  val P: Long = 1000000007L

  /** MinHash permutation constants: sig_i = min((A(i)*h + B(i)) mod P). */
  val MinHashA: Seq[Long] = Seq(2, 3, 5, 7, 11, 13, 17, 19)
  val MinHashB: Seq[Long] = Seq(12345, 23456, 34567, 45678, 56789, 67890, 78901, 89012)

  // ---- tokenization ----

  /** Whitespace tokens (documents.text is single-space separated). */
  def tokens(c: Column): Column = filter(split(c, " "), t => t =!= "")
  def tokensSql(e: String): String =
    s"list_filter(string_split($e, ' '), t -> t <> '')"

  // ---- polynomial string hash: fold (acc*31 + ascii(ch)) mod P ----

  def polyHash(c: Column): Column =
    aggregate(split(c, ""), lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % P)
  def polyHashSql(e: String): String =
    s"list_reduce(list_transform(range(1, len($e)+1), i -> CAST(ascii(($e)[i]) AS BIGINT)), (a, b) -> (a*31 + b) % $P)"

  /** Hash every token of an (already tokenized) array column. */
  def tokenHashes(toks: Column): Column = transform(toks, t => polyHash(t))
  def tokenHashesSql(toksE: String): String =
    s"list_transform($toksE, t -> ${polyHashSql("t")})"

  // ---- 3-gram shingles over token hashes ----
  // shingle hash = ((h1*31 + h2) mod P * 31 + h3) mod P over consecutive
  // token hashes; distinct set per document. Combining token hashes
  // instead of re-hashing shingle strings cuts the char-level work ~20×.

  def shingleHashes(tokHashes: Column): Column = {
    val n = size(tokHashes)
    val idx = when(n >= 3, sequence(lit(1), n - 2)).otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i =>
      ((element_at(tokHashes, i) * 31 + element_at(tokHashes, i + 1)) % P * 31 +
        element_at(tokHashes, i + 2)) % P))
  }
  def shingleHashesSql(thE: String): String =
    s"list_distinct(list_transform(range(1, greatest(len($thE)-2, 0)+1), i -> ((($thE)[i]*31 + ($thE)[i+1]) % $P * 31 + ($thE)[i+2]) % $P))"

  // ---- generic k-gram shingles over token hashes ----
  // Same fold as the 3-gram case but for arbitrary k: acc' = (acc*31+h)%P
  // starting from 0 (first step yields h1, matching DuckDB's seedless
  // list_reduce, whose seed is the first element). Used for decontamination
  // (k=8: a long-n-gram match is near-certain verbatim overlap, not chance).

  def kgramHashes(tokHashes: Column, k: Int): Column = {
    val n = size(tokHashes)
    val idx = when(n >= k, sequence(lit(1), n - (k - 1))).otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i =>
      (0 until k).foldLeft(lit(0L): Column)((acc, j) => (acc * 31 + element_at(tokHashes, i + j)) % P)))
  }
  def kgramHashesSql(thE: String, k: Int): String =
    s"list_distinct(list_transform(range(1, greatest(len($thE)-${k - 1}, 0)+1), i -> list_reduce(list_transform(range(i, i+$k), j -> ($thE)[j]), (a, b) -> (a*31 + b) % $P)))"

  // ---- MinHash signature over a shingle-hash set ----

  def minHashSig(shHashes: Column, i: Int): Column =
    array_min(transform(shHashes, h => (lit(MinHashA(i)) * h + lit(MinHashB(i))) % P))
  def minHashSigSql(shE: String, i: Int): String =
    s"list_min(list_transform($shE, h -> (${MinHashA(i)}*h + ${MinHashB(i)}) % $P))"

  // ---- SimHash (30-bit) over token hashes with multiplicity ----
  // bit b is set iff sum over tokens of ±1 (sign of hash bit b) is >= 0.
  // Built as a SQL-dialect expression (shift amounts are columns, which the
  // Scala shiftleft/shiftright wrappers don't accept).

  def simHash(tokHashesExpr: String): Column = expr(
    s"""aggregate(sequence(0, 29), 0L, (acc, b) -> acc +
       |  IF(aggregate($tokHashesExpr, 0L, (a, h) -> a + (CAST(shiftright(h, b) AS BIGINT) & 1)*2 - 1) >= 0,
       |     shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))""".stripMargin)
  // Outer CAST: DuckDB's list_sum widens to HUGEINT (int128); Spark's
  // aggregate stays BIGINT — without the cast the output dtype mismatches.
  def simHashSql(thE: String): String =
    s"""CAST(list_sum(list_transform(range(0, 30), b ->
       |  CASE WHEN list_sum(list_transform($thE, h -> ((h >> b) & 1)*2 - 1)) >= 0
       |       THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT)""".stripMargin

  // ---- vector math (Array[Float] embeddings) ----
  // Floats are widened to double *before* multiplying and summed strictly
  // left-to-right in both engines, so dot products are bit-identical.

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  def dotSql(aE: String, bE: String): String =
    s"list_reduce(list_transform(range(1, len($aE)+1), i -> CAST(($aE)[i] AS DOUBLE)*CAST(($bE)[i] AS DOUBLE)), (x, y) -> x + y)"

  /** Squared L2 distance in identical sequential double arithmetic on
    * both engines (widen → subtract → square → left-to-right sum). */
  def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val dx = x.cast("double") - y.cast("double"); dx * dx
    }), lit(0.0), (acc, v) => acc + v)
  def distSqSql(aE: String, bE: String): String =
    s"list_reduce(list_transform(range(1, len($aE)+1), i -> (CAST(($aE)[i] AS DOUBLE)-CAST(($bE)[i] AS DOUBLE))*(CAST(($aE)[i] AS DOUBLE)-CAST(($bE)[i] AS DOUBLE))), (x, y) -> x + y)"

  /** Cosine similarity rounded to 6 dp (identical inputs ⇒ identical
    * output; rounding is belt-and-braces at comparison boundaries). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)
  def cosineSql(aE: String, bE: String): String =
    s"ROUND(${dotSql(aE, bE)} / (SQRT(${dotSql(aE, aE)}) * SQRT(${dotSql(bE, bE)})), 6)"

  /** Sign-pattern LSH bucket over the first `bits` dimensions — a
    * deterministic bucket for near-dup blocking (sign random projection
    * onto axes). 16 bits ⇒ 65k blocks: at corpus scale the within-block
    * pair count stays bounded; recall lost to a single flipped sign is
    * recovered by multi-probe (see [[probeBuckets]]).
    * The outer CAST mirrors simHashSql: DuckDB's list_sum widens to
    * HUGEINT, which would trip the driver's dtype gate if projected. */
  def signBucket(aCol: String, bits: Int = 8): Column = expr(
    s"aggregate(sequence(1, $bits), 0L, (acc, i) -> acc + IF(element_at($aCol, i) >= CAST(0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i-1), CAST(0 AS BIGINT)))")
  def signBucketSql(aE: String, bits: Int = 8): String =
    s"CAST(list_sum(list_transform(range(1, ${bits + 1}), i -> CASE WHEN ($aE)[i] >= 0 THEN (CAST(1 AS BIGINT) << (i-1)) ELSE 0 END)) AS BIGINT)"

  /** Multi-probe list for a sign bucket: the bucket itself plus every
    * 1-bit flip — probing all of them recovers the neighbors that a
    * single borderline dimension would otherwise hide in an adjacent
    * block, while keeping candidate generation an equi-join. */
  def probeBuckets(bucket: Column, bits: Int): Column =
    array(bucket +: (0 until bits).map(b => bucket.bitwiseXOR(lit(1L << b))): _*)

  /** Sign-bit packing of dimensions [off+1, off+bits] (1-based) into a
    * BIGINT word, LSB = dimension off+1 — the binary-quantization
    * signature used by q289's Hamming scan. Offset variant of
    * [[signBucket]]: a 64-dim vector packs into TWO 32-bit words rather
    * than one 64-bit word, because bit 63 of a single word would be the
    * BIGINT sign bit (and DuckDB's `<<` on it overflows). Pure integer
    * output ⇒ engine-exact. */
  def packSign(aCol: String, off: Int, bits: Int): Column = expr(
    s"aggregate(sequence(${off + 1}, ${off + bits}), 0L, (acc, i) -> acc + " +
      s"IF(element_at($aCol, i) >= CAST(0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i-${off + 1}), CAST(0 AS BIGINT)))")
  def packSignSql(aE: String, off: Int, bits: Int): String =
    s"CAST(list_sum(list_transform(range(${off + 1}, ${off + bits + 1}), i -> " +
      s"CASE WHEN ($aE)[i] >= 0 THEN (CAST(1 AS BIGINT) << (i-${off + 1})) ELSE 0 END)) AS BIGINT)"
}
