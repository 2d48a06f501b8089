package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth TPC-H batch (q155–q159): Q2, Q9, Q11, Q16 and Q20 — the five
  * queries every earlier batch excluded because they need `partsupp`,
  * which the fixture does not generate. The batch derives it:
  *
  * {{{
  *   partsupp := SELECT l_partkey  AS ps_partkey,
  *                      l_suppkey  AS ps_suppkey,
  *                      MIN(l_extendedprice / l_quantity) AS ps_supplycost,
  *                      COUNT(*)   AS ps_availqty
  *               FROM lineitem GROUP BY 1, 2
  * }}}
  *
  * `MIN` of identically-computed IEEE divisions is order-independent, so
  * the derived cost hash-matches DuckDB without fixed-point tricks; the
  * availability proxy is an exact integer count. Each query keeps its
  * classic plan shape on top of the derived relation:
  *
  *  - Q2's correlated `MIN(ps_supplycost)` subquery (min-cost supplier in
  *    a region) stays a per-part min — implemented as an aggregate +
  *    equi-join back, the decorrelation Catalyst itself would pick;
  *  - Q9's profit formula keeps `ps_supplycost * l_quantity` as the cost
  *    term, summed via [[Det.dsum]] for cross-engine parity;
  *  - Q11's "important stock" scalar-subquery threshold is made
  *    scale-free: `value > 2 × mean part value` instead of the classic
  *    `0.0001/SF` fraction (which zeroes out as N grows);
  *  - Q16's complaint-supplier exclusion becomes `s_acctbal < 0`
  *    (the fixture has no s_comment), still a NOT IN anti-join;
  *  - Q20's availability test becomes "supplier shipped > 30% of the
  *    part's total 1996 quantity" — the same nested IN + correlated
  *    scalar-aggregate shape, but scale-free (both sides of the
  *    comparison grow with SF together).
  *
  * Scale notes: the derived partsupp is one shuffle on
  * `(l_partkey, l_suppkey)` — at 100 TB this is the same hash-aggregate
  * any engine pays to materialize the relation, partial-aggregated
  * map-side first. Dimensions (part, supplier, nation, region) broadcast.
  * Q2 reuses one partsupp scan for both the probe and the per-part min
  * (self-agg, not a second read). All quantity sums are exact: the
  * fixture's `l_quantity` is integral, and integer-valued doubles add
  * associatively below 2^53.
  *
  * Reference anchor: the medallion pipeline's query tier
  * (`linehaul_silver_gold.py`) is star-join + aggregate over renamed
  * columns; these adapted TPC-H shapes grade the same join/agg machinery
  * at adversarial sizes.
  */
object Tpch4 {
  type Q = (SparkSession, String) => DataFrame

  /** Derived partsupp (see object doc). One hash-aggregate over lineitem. */
  private def partsupp(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(
        min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"),
        count(lit(1)).as("ps_availqty"))

  private val PartsuppSql: String =
    """SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    MIN(l_extendedprice / l_quantity) AS ps_supplycost,
      |    COUNT(*) AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2""".stripMargin

  /** q155 — TPC-H Q2 (minimum-cost supplier): for each mid-size part of
    * one type, the European supplier offering the minimum derived supply
    * cost. The correlated MIN subquery decorrelates into a per-part
    * aggregate on the *already region-filtered* partsupp, joined back on
    * (part, cost) equality — cost equality is safe because both sides
    * carry the identical double. Ties (two suppliers at the exact same
    * min cost) are kept, as in the classic query. */
  def q155TpchQ2(s: SparkSession, d: String): DataFrame = {
    val nr = Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val su = Tables.supplier(s, d)
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val euro = partsupp(s, d)
      .join(broadcast(su), col("ps_suppkey") === col("s_suppkey"))
      .select(col("ps_partkey"), col("ps_supplycost"),
        col("s_name"), col("s_acctbal"), col("n_name"))
      .persist() // two uses: the probe and the per-part min
    val minCost = euro.groupBy(col("ps_partkey").as("m_partkey"))
      .agg(min(col("ps_supplycost")).as("m_cost"))
    val pa = Tables.part(s, d)
      .filter(col("p_size") === 15 && col("p_type") =!= "MEDIUM")
      .select(col("p_partkey"), col("p_name"))
    euro
      .join(minCost, col("ps_partkey") === col("m_partkey") &&
        col("ps_supplycost") === col("m_cost"))
      .join(broadcast(pa), col("ps_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  val q155Sql: String =
    s"""WITH partsupp AS (
       |  $PartsuppSql),
       |euro AS (
       |  SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
       |  FROM partsupp
       |  JOIN supplier ON ps_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'EUROPE')
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
       |FROM euro JOIN part ON ps_partkey = p_partkey
       |WHERE p_size = 15 AND p_type <> 'MEDIUM'
       |  AND ps_supplycost = (
       |    SELECT MIN(e2.ps_supplycost) FROM euro e2
       |    WHERE e2.ps_partkey = euro.ps_partkey)
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  /** q156 — TPC-H Q9 (product-type profit): profit per supplier nation
    * and order year over parts whose name mentions one noun. The profit
    * term mixes a lineitem revenue with the derived per-partsupp cost,
    * summed order-independently via [[Det.dsum]]. Plan shape: lineitem
    * joins partsupp on the composite (partkey, suppkey) — the one
    * non-dimension join — then dimensions broadcast. */
  def q156TpchQ9(s: SparkSession, d: String): DataFrame = {
    val pa = Tables.part(s, d).filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, d)
      .join(broadcast(pa), col("l_partkey") === col("p_partkey"))
    val ps = partsupp(s, d).select(col("ps_partkey"), col("ps_suppkey"), col("ps_supplycost"))
    val su = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    val na = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
    li.join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("ps_supplycost") * col("l_quantity")).as("amount"))
      .groupBy(col("nation"), col("o_year"))
      .agg(Det.dsum(col("amount")).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q156Sql: String =
    s"""WITH partsupp AS (
       |  $PartsuppSql)
       |SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |  ${Det.dsumSql("l_extendedprice * (1.0 - l_discount) - ps_supplycost * l_quantity")} AS sum_profit
       |FROM lineitem
       |JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%gear%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  /** q157 — TPC-H Q11 (important stock): per-part inventory value held by
    * one nation's suppliers, kept when above 2× the mean part value — the
    * scalar-subquery HAVING, made scale-free (the classic `0.0001/SF`
    * fraction degenerates as N grows; 2× the mean keeps a stable selectivity
    * at every SF). The threshold is a 1-row broadcast cross-join. */
  def q157TpchQ11(s: SparkSession, d: String): DataFrame = {
    val su = Tables.supplier(s, d).filter(col("s_nationkey") === 9)
      .select(col("s_suppkey"))
    val vals = partsupp(s, d)
      .join(broadcast(su), col("ps_suppkey") === col("s_suppkey"))
      .select(col("ps_partkey"),
        (col("ps_supplycost") * col("ps_availqty")).as("v"))
      .groupBy(col("ps_partkey"))
      .agg(Det.dsum(col("v")).as("value"))
    val thresh = vals.agg(
      (Det.dsum(col("value")) * lit(2.0) / count(lit(1))).as("cut"))
    vals.crossJoin(broadcast(thresh))
      .filter(col("value") > col("cut"))
      .select(col("ps_partkey"), col("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  val q157Sql: String =
    s"""WITH partsupp AS (
       |  $PartsuppSql),
       |vals AS (
       |  SELECT ps_partkey, ${Det.dsumSql("ps_supplycost * ps_availqty")} AS value
       |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
       |  WHERE s_nationkey = 9
       |  GROUP BY ps_partkey)
       |SELECT ps_partkey, value FROM vals
       |WHERE value > (SELECT ${Det.dsumSql("value")} * 2.0 / COUNT(*) FROM vals)
       |ORDER BY value DESC, ps_partkey""".stripMargin

  /** q158 — TPC-H Q16 (parts/supplier relationship): distinct supplier
    * count per (brand, type, size) bucket for selected sizes, excluding
    * one brand, one type, and "complaint" suppliers (adapted:
    * `s_acctbal < 0`) via NOT IN → a broadcast anti-join. COUNT(DISTINCT)
    * over the composite grouping is the query's point: two shuffles
    * (expand + final), both on bounded-cardinality keys. */
  def q158TpchQ16(s: SparkSession, d: String): DataFrame = {
    val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("bad_suppkey"))
    val pa = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "MEDIUM" &&
        col("p_size").isin(1, 9, 15, 23, 36, 45, 49, 3))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    partsupp(s, d)
      .join(broadcast(bad), col("ps_suppkey") === col("bad_suppkey"), "left_anti")
      .join(broadcast(pa), col("ps_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q158Sql: String =
    s"""WITH partsupp AS (
       |  $PartsuppSql)
       |SELECT p_brand, p_type, p_size,
       |  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
       |FROM partsupp JOIN part ON ps_partkey = p_partkey
       |WHERE p_brand <> 'Brand#13' AND p_type <> 'MEDIUM'
       |  AND p_size IN (1, 9, 15, 23, 36, 45, 49, 3)
       |  AND ps_suppkey NOT IN (
       |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** q159 — TPC-H Q20 (potential part promotion): suppliers in one region
    * who shipped more than 30% of some named part's total 1996 quantity —
    * nested IN (part-name subset) + correlated scalar aggregate
    * (per-part year total), decorrelated into a part-level aggregate
    * joined back. Quantity sums are exact (integral doubles, < 2^53).
    * Output is the supplier list — a final broadcast semi-join. */
  def q159TpchQ20(s: SparkSession, d: String): DataFrame = {
    val pa = Tables.part(s, d).filter(col("p_name").like("%widget%"))
      .select(col("p_partkey"))
    val li96 = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(pa), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val bySupp = li96.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val byPart = li96.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("l_quantity")).as("total"))
    val qualified = bySupp
      .join(byPart, col("l_partkey") === col("t_partkey"))
      .filter(col("qty") > col("total") * lit(0.3))
      .select(col("l_suppkey")).distinct()
    val nr = Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    Tables.supplier(s, d)
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val q159Sql: String =
    """WITH psy AS (
      |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01'
      |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
      |  GROUP BY 1, 2)
      |SELECT s_name, s_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND s_suppkey IN (
      |    SELECT p1.l_suppkey FROM psy p1
      |    WHERE p1.qty > 0.3 * (
      |      SELECT SUM(p2.qty) FROM psy p2 WHERE p2.l_partkey = p1.l_partkey))
      |ORDER BY s_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "q155_tpch_q2" -> q155TpchQ2 _,
    "q156_tpch_q9" -> q156TpchQ9 _,
    "q157_tpch_q11" -> q157TpchQ11 _,
    "q158_tpch_q16" -> q158TpchQ16 _,
    "q159_tpch_q20" -> q159TpchQ20 _)

  val oracles: Map[String, String] = Map(
    "q155_tpch_q2" -> q155Sql,
    "q156_tpch_q9" -> q156Sql,
    "q157_tpch_q11" -> q157Sql,
    "q158_tpch_q16" -> q158Sql,
    "q159_tpch_q20" -> q159Sql)
}
