package graft.operators

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-pattern operators: direct n-gram Jaccard dedup, salted two-stage
  * aggregation (the skew-mitigation pattern, oracle-identical to the
  * direct plan), and sketch aggregates.
  */
object ScaleOps {
  type Q = (SparkSession, String) => DataFrame

  /** q40 — n-gram Jaccard near-dup pairs WITHOUT MinHash: candidates are
    * doc pairs sharing ≥1 shingle (inverted-index join — work scales with
    * true shingle collisions, not |docs|²), then exact Jaccard ≥ 0.5.
    * This is the ground-truth dedup; q35 is its sub-linear approximation. */
  def q40NgramJaccard(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val dict = tok.select(col("tok")).distinct().withColumn("h", polyHash(col("tok")))
    val wp = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val sh = tok.join(broadcast(dict), "tok")
      .withColumn("h1", lead(col("h"), 1).over(wp))
      .withColumn("h2", lead(col("h"), 2).over(wp))
      .filter(col("h2").isNotNull)
      .select(col("doc_id"), ((col("h") * 31 + col("h1")) % P * 31 + col("h2")) % P as "sh")
      .distinct().persist()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    common
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("jac", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jac") >= 0.5)
      .select(col("da"), col("db"), col("jac"))
      .orderBy(col("da"), col("db"))
  }

  val q40Sql: String = {
    val shingles = shingleHashesSql(tokenHashesSql(tokensSql("text")))
    s"""WITH g AS (SELECT doc_id, $shingles AS shl FROM documents),
       |e AS (SELECT doc_id, unnest(shl) AS sh FROM g),
       |sz AS (SELECT doc_id, len(shl) AS n FROM g),
       |common AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
       |  FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da, db,
       |  ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jac
       |FROM common
       |JOIN sz sa ON sa.doc_id = da
       |JOIN sz sb ON sb.doc_id = db
       |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
       |ORDER BY da, db""".stripMargin
  }

  /** q41 — salted two-stage aggregation: the skew-mitigation pattern.
    * Stage 1 aggregates on (key, salt) — a hot key spreads over 8
    * partitions; stage 2 combines partials. Result is identical to the
    * direct groupBy (sums of exact decimals are associative), which is
    * exactly what the oracle checks. */
  def q41SaltedAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("salt", pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(8)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity").cast(Det.Dec)).as("part_qty"), count(lit(1)).as("part_n"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("part_qty")).cast("double").as("sum_qty"), sum(col("part_n")).as("n"))
      .orderBy(col("l_returnflag"))

  val q41Sql: String =
    s"""SELECT l_returnflag, ${Det.dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q92 — sketch aggregates (approx_count_distinct HLL, approx quantiles):
    * engine-specific estimators, so rows-only check (no oracle). */
  def q92Sketches(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99))").as("price_quantiles"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, Q] = Map(
    "q40_ngram_jaccard" -> q40NgramJaccard _,
    "q41_salted_agg" -> q41SaltedAgg _,
    "q92_sketches" -> q92Sketches _)

  val oracles: Map[String, String] = Map(
    "q40_ngram_jaccard" -> q40Sql,
    "q41_salted_agg" -> q41Sql)
}
