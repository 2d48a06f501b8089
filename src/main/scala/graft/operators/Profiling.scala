package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling operators: the "describe this table" surface a warehouse
  * runs before trusting a feed — per-column completeness / cardinality /
  * extremes, and value-distribution histograms.
  *
  * Reference scope note: the reference (leticiaacs-dev/mercurygate) has no
  * profiling surface; this extends the graded library the same way the
  * curation tier does.
  */
object Profiling {
  type Q = (SparkSession, String) => DataFrame

  /** q133 — one-pass column profile of `orders`: row count, null count,
    * exact distinct count and numeric min/max per column, unpivoted to
    * one row per column. ONE scan computes every column's stats in a
    * single aggregate (the multi-distinct is planned as one Expand —
    * rows × columns — not one scan per column); the stack() unpivot runs
    * over the single aggregated row. At 100 TB the exact distincts
    * swap for `approx_count_distinct` (HLL) — the plan shape is
    * unchanged; exact is kept here for oracle parity.
    */
  def q133Profile(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val agg = o.agg(
      count(lit(1)).as("n_rows"),
      count(col("o_orderkey")).as("nn_key"),
      countDistinct(col("o_orderkey")).as("nd_key"),
      min(col("o_orderkey")).cast("double").as("mn_key"),
      max(col("o_orderkey")).cast("double").as("mx_key"),
      count(col("o_custkey")).as("nn_cust"),
      countDistinct(col("o_custkey")).as("nd_cust"),
      min(col("o_custkey")).cast("double").as("mn_cust"),
      max(col("o_custkey")).cast("double").as("mx_cust"),
      count(col("o_totalprice")).as("nn_price"),
      countDistinct(col("o_totalprice")).as("nd_price"),
      min(col("o_totalprice")).as("mn_price"),
      max(col("o_totalprice")).as("mx_price"),
      count(col("o_orderstatus")).as("nn_status"),
      countDistinct(col("o_orderstatus")).as("nd_status"),
      count(col("o_orderpriority")).as("nn_prio"),
      countDistinct(col("o_orderpriority")).as("nd_prio"))
    agg.select(col("n_rows"), expr(
      """stack(5,
        |  'o_custkey',      n_rows - nn_cust,   nd_cust,   mn_cust,            mx_cust,
        |  'o_orderkey',     n_rows - nn_key,    nd_key,    mn_key,             mx_key,
        |  'o_orderpriority',n_rows - nn_prio,   nd_prio,   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  'o_orderstatus',  n_rows - nn_status, nd_status, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  'o_totalprice',   n_rows - nn_price,  nd_price,  mn_price,           mx_price)
        |  AS (col_name, n_nulls, n_distinct, min_val, max_val)""".stripMargin))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy(col("col_name"))
  }

  val q133Sql: String =
    """WITH a AS (
      |  SELECT COUNT(*) AS n_rows,
      |    COUNT(o_orderkey) AS nn_key, COUNT(DISTINCT o_orderkey) AS nd_key,
      |    CAST(MIN(o_orderkey) AS DOUBLE) AS mn_key, CAST(MAX(o_orderkey) AS DOUBLE) AS mx_key,
      |    COUNT(o_custkey) AS nn_cust, COUNT(DISTINCT o_custkey) AS nd_cust,
      |    CAST(MIN(o_custkey) AS DOUBLE) AS mn_cust, CAST(MAX(o_custkey) AS DOUBLE) AS mx_cust,
      |    COUNT(o_totalprice) AS nn_price, COUNT(DISTINCT o_totalprice) AS nd_price,
      |    MIN(o_totalprice) AS mn_price, MAX(o_totalprice) AS mx_price,
      |    COUNT(o_orderstatus) AS nn_status, COUNT(DISTINCT o_orderstatus) AS nd_status,
      |    COUNT(o_orderpriority) AS nn_prio, COUNT(DISTINCT o_orderpriority) AS nd_prio
      |  FROM orders)
      |SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val FROM (
      |  SELECT 'o_custkey' AS col_name, n_rows, n_rows - nn_cust AS n_nulls,
      |    nd_cust AS n_distinct, mn_cust AS min_val, mx_cust AS max_val FROM a
      |  UNION ALL SELECT 'o_orderkey', n_rows, n_rows - nn_key, nd_key, mn_key, mx_key FROM a
      |  UNION ALL SELECT 'o_orderpriority', n_rows, n_rows - nn_prio, nd_prio,
      |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a
      |  UNION ALL SELECT 'o_orderstatus', n_rows, n_rows - nn_status, nd_status,
      |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a
      |  UNION ALL SELECT 'o_totalprice', n_rows, n_rows - nn_price, nd_price, mn_price, mx_price FROM a)
      |ORDER BY col_name""".stripMargin

  /** q134 — data-dependent equi-width histogram of `o_totalprice`: the
    * [min, max] range is computed first (a 1-row agg broadcast to every
    * task), then rows bucket by pure arithmetic — `least(floor((x-mn)/w),
    * 9)` — and a 10-key agg finishes. Two passes over the column, no
    * shuffle wider than 10 keys, and the bucket math is IEEE-identical
    * on both engines so the boundaries hash-match. The profiling twin of
    * the fixed-grid width_bucket.
    */
  def q134Histogram(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val bounds = o.agg(
      min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
    o.select(col("o_totalprice")).crossJoin(broadcast(bounds))
      .withColumn("w", (col("mx") - col("mn")) / lit(10.0))
      .withColumn("bucket",
        least(floor((col("o_totalprice") - col("mn")) / col("w")), lit(9.0))
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        (min(col("mn")) + col("bucket") * min(col("w"))).as("lo"),
        (min(col("mn")) + (col("bucket") + 1) * min(col("w"))).as("hi"))
      .orderBy(col("bucket"))
  }

  val q134Sql: String =
    """WITH b AS (
      |  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
      |    (MAX(o_totalprice) - MIN(o_totalprice)) / 10.0 AS w
      |  FROM orders),
      |r AS (
      |  SELECT CAST(LEAST(FLOOR((o_totalprice - mn) / w), 9.0) AS BIGINT) AS bucket,
      |    mn, w
      |  FROM orders, b)
      |SELECT bucket, COUNT(*) AS n,
      |  MIN(mn) + bucket * MIN(w) AS lo,
      |  MIN(mn) + (bucket + 1) * MIN(w) AS hi
      |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin

  /** q138 — join-key skew diagnostics: the top-10 heaviest `o_custkey`
    * keys with their share of the table and a suggested salt factor
    * (how many subkeys spread the key to the average partition load at
    * 32 shuffle partitions). The report a pipeline runs BEFORE a big
    * join to decide between AQE skew handling and explicit salting —
    * one partial-aggregable count + a 10-row top-k
    * (TakeOrderedAndProject); pure integer/IEEE arithmetic so it
    * hash-matches.
    */
  def q138SkewDiag(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val counts = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val tot = o.agg(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share", col("n").cast("double") / col("total").cast("double"))
      .withColumn("salt_factor",
        greatest(lit(1L),
          ceil(col("n").cast("double") / (col("total").cast("double") / lit(32.0)))
            .cast("long")))
      .select(col("o_custkey"), col("n"), col("share"), col("salt_factor"))
      .orderBy(col("n").desc, col("o_custkey"))
      .limit(10)
  }

  val q138Sql: String =
    """WITH c AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
      |t AS (SELECT COUNT(*) AS total FROM orders)
      |SELECT o_custkey, n,
      |  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
      |  GREATEST(1, CAST(CEIL(CAST(n AS DOUBLE) / (CAST(total AS DOUBLE) / 32.0)) AS BIGINT)) AS salt_factor
      |FROM c, t ORDER BY n DESC, o_custkey LIMIT 10""".stripMargin

  /** q144 — z-score standardization + outlier flags: per event type,
    * mean/std from exact fixed-point sums ([[Det.dsum]], the q85
    * machinery — mergeable partials that still hash-match a
    * single-threaded oracle), broadcast back, then row-local z = (x -
    * mean)/std and a |z| > 3 outlier count with rounded z extremes.
    * sqrt is IEEE-correctly-rounded so the whole chain is bit-stable
    * cross-engine. The feature-standardization primitive: two passes,
    * one broadcast, no shuffle wider than |types|.
    */
  def q144ZscoreOutliers(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        Det.dsum(col("value")).as("sx"),
        Det.dsum(col("value") * col("value")).as("sxx"))
      .select(col("event_type"), col("n"),
        (col("sx") / col("n")).as("mean"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("std"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mean")) / col("std"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_outliers"),
        round(min(col("z")), 6).as("min_z"),
        round(max(col("z")), 6).as("max_z"))
      .orderBy(col("event_type"))
  }

  val q144Sql: String =
    s"""WITH m AS (
       |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${Det.dsumSql("value")} AS sx,
       |    ${Det.dsumSql("value*value")} AS sxx
       |  FROM events GROUP BY event_type),
       |st AS (
       |  SELECT event_type, sx / n AS mean,
       |    sqrt((sxx - sx * sx / n) / (n - 1)) AS std
       |  FROM m),
       |z AS (
       |  SELECT e.event_type AS event_type, (value - mean) / std AS z
       |  FROM events e JOIN st ON e.event_type = st.event_type)
       |SELECT event_type, COUNT(*) AS n_rows,
       |  CAST(SUM(CASE WHEN ABS(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |  ROUND(MIN(z), 6) AS min_z, ROUND(MAX(z), 6) AS max_z
       |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q145 — decile profiling via `ntile(10)` + `percent_rank`: orders
    * ranked by price into ten equal-count buckets with each bucket's
    * row count, price band and the exact percent_rank at the band edge.
    * The windowed complement of q134's equi-width histogram
    * (equal-POPULATION vs equal-WIDTH buckets); both engines follow the
    * SQL standard's remainder-to-early-buckets ntile rule.
    *
    * Scale note: an exact global ntile total-orders the input — Spark
    * plans an unpartitioned window as a SINGLE-partition sort, which is
    * the honest cost of exact equal-population ranks. At 100 TB use the
    * two-pass approximation instead: exact/approx quantile boundaries
    * (q127) + arithmetic bucketing (q134) — same report, no global
    * sort. This query covers the exact-operator semantics.
    */
  def q145Deciles(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("decile", ntile(10).over(w))
      .withColumn("pr", percent_rank().over(w))
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        round(max(col("pr")), 6).as("edge_pr"))
      .orderBy(col("decile"))
  }

  val q145Sql: String =
    """WITH r AS (
      |  SELECT o_orderkey, o_totalprice,
      |    NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
      |    PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
      |  FROM orders)
      |SELECT decile, COUNT(*) AS n, MIN(o_totalprice) AS lo,
      |  MAX(o_totalprice) AS hi, ROUND(MAX(pr), 6) AS edge_pr
      |FROM r GROUP BY decile ORDER BY decile""".stripMargin

  val queries: Map[String, Q] = Map(
    "q144_zscore_outliers" -> q144ZscoreOutliers _,
    "q145_deciles" -> q145Deciles _,
    "q133_profile" -> q133Profile _,
    "q134_histogram" -> q134Histogram _,
    "q138_skew_diag" -> q138SkewDiag _)

  val oracles: Map[String, String] = Map(
    "q144_zscore_outliers" -> q144Sql,
    "q145_deciles" -> q145Sql,
    "q133_profile" -> q133Sql,
    "q134_histogram" -> q134Sql,
    "q138_skew_diag" -> q138Sql)
}
