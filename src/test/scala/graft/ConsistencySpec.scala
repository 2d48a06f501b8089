package graft

import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The portable HOF reference implementations and the dictionary-encoded
  * production paths must agree — q35/q36 run the fast path, these pin it
  * to the slow-but-obvious one. */
class ConsistencySpec extends AnyFunSuite {
  import TestSpark._

  test("q36 dictionary-encoded simhash equals the HOF reference implementation") {
    val docs = Tables.documents(spark, sf).limit(50)
    val ref = docs
      .withColumn("th", Portable.tokenHashes(Portable.tokens(col("text"))))
      .withColumn("simhash", Portable.simHash("th"))
      .select(col("doc_id"), col("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = operators.TextOps.q36SimHash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    ref.foreach { case (id, h) => assert(fast(id) == h, s"doc $id") }
  }

  test("q35 signature pipeline equals HOF minHashSig over HOF shingles") {
    val docs = Tables.documents(spark, sf).limit(30)
    val ref = docs
      .withColumn("th", Portable.tokenHashes(Portable.tokens(col("text"))))
      .withColumn("sh", Portable.shingleHashes(col("th")))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        Portable.minHashSig(col("sh"), 0).as("s0"),
        Portable.minHashSig(col("sh"), 7).as("s7"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute via the q35 fast path building blocks (lead-window shingles)
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"), posexplode(Portable.tokens(col("text"))).as(Seq("pos", "tok")))
    val dict = tok.select(col("tok")).distinct().withColumn("h", Portable.polyHash(col("tok")))
    val wp = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val fast = tok.join(broadcast(dict), "tok")
      .withColumn("h1", lead(col("h"), 1).over(wp))
      .withColumn("h2", lead(col("h"), 2).over(wp))
      .filter(col("h2").isNotNull)
      .select(col("doc_id"),
        ((col("h") * 31 + col("h1")) % Portable.P * 31 + col("h2")) % Portable.P as "sh")
      .distinct()
      .groupBy(col("doc_id"))
      .agg(
        min((lit(Portable.MinHashA(0)) * col("sh") + lit(Portable.MinHashB(0))) % Portable.P).as("s0"),
        min((lit(Portable.MinHashA(7)) * col("sh") + lit(Portable.MinHashB(7))) % Portable.P).as("s7"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ref == fast)
  }
}
