package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond q55's connected components: PageRank
  * over the customer↔supplier co-purchase graph (an edge per distinct
  * (o_custkey, l_suppkey) pair observed through orders⋈lineitem,
  * symmetrized — so every node has degree ≥ 1 and the dangling-mass term
  * vanishes).
  *
  * Shape per iteration (the same message-passing skeleton as Lloyd's
  * k-means in [[graft.ml.KMeansIvf]] and the q55 label propagation): one
  * shuffle to join ranks onto edge sources, one partial-aggregable
  * groupBy on the destination. Ranks use the mean-1 normalization
  * (rank × N), so the 6-dp fixed-point [[Det]] sums and per-iteration
  * rounding that pin cross-engine bit parity keep real precision at any
  * N — with the raw 1/N scale, 6 dp would quantize away the signal on a
  * large graph (and N itself never needs to reach the driver). Lineage
  * is truncated each round with a localCheckpoint of the aggregated
  * ranks, which stay |nodes|-bounded.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** PageRank damping factor. */
  val Damping = 0.85

  /** Fixed Lloyd-style iteration count — unrolled in the oracle. */
  val Iters = 3

  /** q151 — 3-iteration PageRank, top-20 nodes. Node ids are prefixed
    * ('c' customers, 's' suppliers) so the two key spaces cannot
    * collide. Every per-node contribution sum is an order-independent
    * fixed-point [[Det.dsum]] and every new rank is rounded to 6 dp, so
    * the trajectory is bit-identical to the serial DuckDB oracle. */
  def q151Pagerank(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val e0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .distinct()
    val edges = e0.unionAll(e0.select(col("b").as("a"), col("a").as("b")))
    val deg = edges.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
    // the degree is constant across iterations: fold it onto the edge
    // list ONCE, so each round joins a single table — and the persisted
    // join output is hash-partitioned on `a`, which every iteration's
    // ranks join then reuses without re-shuffling the edges
    val edgesW = edges.join(deg.withColumnRenamed("node", "a"), "a").persist()
    val base = lit(1.0 - Damping) // mean-1 scaling: (1-d) replaces (1-d)/N
    var ranks = edgesW.select(col("a").as("node")).distinct()
      .select(col("node"), lit(1.0).as("rank"))
    for (_ <- 1 to Iters) {
      val contrib = edgesW
        .join(ranks.withColumnRenamed("node", "a"), "a")
        .select(col("b").as("node"), (col("rank") / col("d")).as("c"))
      ranks = contrib.groupBy(col("node"))
        .agg(round(base + lit(Damping) * Det.dsum(col("c")), 6).as("rank"))
        .localCheckpoint()
    }
    val w = Window.orderBy(col("rank").desc, col("node"))
    ranks.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 20)
      .select(col("rnk"), col("node"), col("rank"))
      .orderBy(col("rnk"))
  }

  /** Oracle: the iterations unrolled as CTEs — same fixed-point sums,
    * same 6-dp rounding, same symmetric edge set. */
  val q151Sql: String = {
    val iters = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT e.b AS node,
         |    ROUND(CAST(${1.0 - Damping} AS DOUBLE)
         |      + CAST($Damping AS DOUBLE) * ${Det.dsumSql(s"r.rank / d.d")}, 6) AS rank
         |  FROM edges e JOIN r${i - 1} r ON r.node = e.a JOIN deg d ON d.node = e.a
         |  GROUP BY e.b)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
       |deg AS (SELECT a AS node, COUNT(*) AS d FROM edges GROUP BY a),
       |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM deg),
       |$iters,
       |ranked AS (
       |  SELECT node, rank, ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rnk
       |  FROM r$Iters)
       |SELECT rnk, node, rank FROM ranked WHERE rnk <= 20 ORDER BY rnk""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q151_pagerank" -> q151Pagerank _)
  val oracles: Map[String, String] = Map(
    "q151_pagerank" -> q151Sql)
}
