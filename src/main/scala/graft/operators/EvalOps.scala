package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-evaluation operators: deterministic Poisson-bootstrap
  * confidence intervals and exact AUC via score-histogram rank sums.
  */
object EvalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Bootstrap replica count for q255. */
  val BootB = 32
  /** Hash mixing constants (Knuth multiplicative + replica offset). */
  val BootMix = 2654435761L

  /** q255 — deterministic Poisson bootstrap of the mean order value: 32
    * resamples in ONE pass, each row's per-replica multiplicity drawn
    * from an integer-hash surrogate of Poisson(1) (P(0)≈.368, P(1)≈.368,
    * P(2)≈.184, P(≥3)≈.080 — the documented quantization of the true
    * pmf). This is the production bootstrap shape: no data is copied B
    * times; the replica axis is a B-row broadcast and every replica mean
    * is an exact micro-unit ratio. Replicas are reproducible by anyone
    * with the ids (the q239/q236 determinism contract applied to
    * uncertainty estimation).
    */
  def q255Bootstrap(s: SparkSession, d: String): DataFrame = {
    val reps = s.createDataFrame((0 until BootB).map(Tuple1(_))).toDF("b")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * lit(1000000.0) + lit(0.5)).cast("long").as("x_micro"))
    val u = pmod(col("o_orderkey") * BootMix + col("b") * lit(40503L), lit(1000L))
    val w = when(u < 368, 0L).when(u < 736, 1L).when(u < 920, 2L).otherwise(3L)
    o.crossJoin(broadcast(reps))
      .withColumn("w", w)
      .groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("x_micro")).as("sx"))
      .select(col("b").cast("long").as("b"), col("n_eff"),
        floor(col("sx").cast("double") / col("n_eff").cast("double") + lit(0.5))
          .cast("long").as("mean_micro"))
      .orderBy(col("b"))
  }

  val q255Sql: String =
    s"""WITH reps AS (SELECT unnest(range(0, $BootB)) AS b),
       |o AS (SELECT o_orderkey,
       |             CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS BIGINT) AS x_micro
       |      FROM orders),
       |wt AS (
       |  SELECT b, x_micro,
       |         CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1
       |              WHEN u < 920 THEN 2 ELSE 3 END AS w
       |  FROM (SELECT b, x_micro,
       |          ((o_orderkey * $BootMix + b * 40503) % 1000 + 1000) % 1000 AS u
       |        FROM o CROSS JOIN reps))
       |SELECT CAST(b AS BIGINT) AS b,
       |       CAST(SUM(w) AS BIGINT) AS n_eff,
       |       CAST(FLOOR(CAST(SUM(w * x_micro) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) + 0.5)
       |         AS BIGINT) AS mean_micro
       |FROM wt GROUP BY b ORDER BY b""".stripMargin

  /** q256 — exact AUC of the per-customer target encoder against the
    * urgent label, via the score-histogram rank-sum (Mann–Whitney U):
    * AUC = Σ_v pos(v)·(neg_below(v) + neg(v)/2) / (P·N), all exact
    * integers until one final division. The load-bearing scale fact:
    * the cumulative window runs over DISTINCT SCORE VALUES, whose count
    * is bounded by the encoder's value space (pairs (n, Σy) with n ≤
    * orders-per-customer) — not by the row count — so no corpus-wide
    * sort ever happens; ties are handled exactly by the +neg(v)/2 term
    * rather than by an arbitrary ordering.
    */
  def q256AucExact(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey").as("cat"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("y"))
    val stats = o.groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("ss"))
    val glob = o.agg(count(lit(1)).as("gn"), sum(col("y")).as("gs"))
    val prior = col("gs").cast("double") / col("gn").cast("double")
    val pMicro = floor((col("ss").cast("double") + lit(MlOps.EncM) * prior) /
      (col("n").cast("double") + lit(MlOps.EncM)) * lit(1000000.0) + lit(0.5)).cast("long")
    val scored = o.join(stats, "cat").crossJoin(broadcast(glob))
      .select(col("y"), pMicro.as("v"))
    val hist = scored.groupBy(col("v"))
      .agg(sum(col("y")).as("pos"), sum(lit(1) - col("y")).as("neg"))
    val wv = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val terms = hist
      .withColumn("neg_below", coalesce(sum(col("neg")).over(wv), lit(0L)))
      .withColumn("numer2", col("pos") * (lit(2L) * col("neg_below") + col("neg")))
    terms.agg(sum(col("pos")).as("np"), sum(col("neg")).as("nn"),
        count(lit(1)).as("n_scores"), sum(col("numer2")).as("u2"))
      .select(col("np"), col("nn"), col("n_scores"),
        floor(col("u2").cast("double") /
          (lit(2.0) * col("np").cast("double") * col("nn").cast("double")) *
          lit(1000000.0) + lit(0.5)).cast("long").as("auc_micro"))
  }

  val q256Sql: String =
    s"""WITH o AS (
       |  SELECT o_custkey AS cat,
       |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
       |  FROM orders),
       |stats AS (SELECT cat, CAST(COUNT(*) AS BIGINT) AS n,
       |                 CAST(SUM(y) AS BIGINT) AS ss FROM o GROUP BY cat),
       |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS gn, CAST(SUM(y) AS BIGINT) AS gs FROM o),
       |scored AS (
       |  SELECT y,
       |         CAST(FLOOR((CAST(ss AS DOUBLE) + ${MlOps.EncM} * (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)))
       |                / (CAST(n AS DOUBLE) + ${MlOps.EncM}) * 1000000.0 + 0.5) AS BIGINT) AS v
       |  FROM o JOIN stats USING (cat), g),
       |hist AS (
       |  SELECT v, CAST(SUM(y) AS BIGINT) AS pos,
       |         CAST(SUM(1 - y) AS BIGINT) AS neg
       |  FROM scored GROUP BY v),
       |terms AS (
       |  SELECT pos, neg,
       |         CAST(COALESCE(SUM(neg) OVER (ORDER BY v
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |           AS neg_below
       |  FROM hist)
       |SELECT CAST(SUM(pos) AS BIGINT) AS np,
       |       CAST(SUM(neg) AS BIGINT) AS nn,
       |       CAST(COUNT(*) AS BIGINT) AS n_scores,
       |       CAST(FLOOR(CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)
       |              / (2.0 * CAST(SUM(pos) AS DOUBLE) * CAST(SUM(neg) AS DOUBLE))
       |              * 1000000.0 + 0.5) AS BIGINT) AS auc_micro
       |FROM terms""".stripMargin

  val queries: Map[String, Q] = Map(
    "q255_bootstrap" -> q255Bootstrap _,
    "q256_auc_exact" -> q256AucExact _)

  val oracles: Map[String, String] = Map(
    "q255_bootstrap" -> q255Sql,
    "q256_auc_exact" -> q256Sql)
}
