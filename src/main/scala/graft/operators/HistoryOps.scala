package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-history operators: SCD Type-2 interval construction.
  *
  * The reference's silver layer keeps only the latest row per primary key
  * (PK dedup, q14/q73) — the other standard warehouse treatment of the
  * same update stream is slowly-changing-dimension history: one row per
  * (key, attribute-run) with [valid_from, valid_to) intervals and an
  * is_current flag. Built here from the events fixture (user_id = key,
  * event_type = tracked attribute).
  */
object HistoryOps {
  type Q = (SparkSession, String) => DataFrame

  /** q108 — SCD Type-2 build: per user, consecutive events with the same
    * event_type collapse into one version row; a version opens when the
    * attribute changes (change-flag + running sum = version number),
    * valid_to is the next version's valid_from (null on the current row).
    *
    * Scale shape: two windows and one groupBy, all partitioned by the
    * high-cardinality entity key — one shuffle on user_id, linear
    * in-partition passes, partial-agg on the version collapse. The
    * standard change-data-capture → dimension-history pipeline. */
  def q108Scd2(s: SparkSession, d: String): DataFrame = {
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val versioned = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wSeq))
      .withColumn("chg",
        (col("prev_type").isNull || col("prev_type") =!= col("event_type")).cast("long"))
      .withColumn("version", sum(col("chg")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = versioned.groupBy(col("user_id"), col("version"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    val wVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wVer))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"), col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val q108Sql: String =
    """WITH seq AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |v AS (
      |  SELECT user_id, ts, event_type,
      |    SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      |  FROM seq),
      |runs AS (
      |  SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
      |    MIN(ts) AS valid_from, COUNT(*) AS n_events
      |  FROM v GROUP BY 1, 2, 3)
      |SELECT user_id, version, event_type, valid_from,
      |  LEAD(valid_from, 1) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
      |  n_events,
      |  CAST(LEAD(valid_from, 1) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS INTEGER) AS is_current
      |FROM runs ORDER BY user_id, version""".stripMargin

  val queries: Map[String, Q] = Map("q108_scd2" -> q108Scd2 _)
  val oracles: Map[String, String] = Map("q108_scd2" -> q108Sql)
}
