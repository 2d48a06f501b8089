package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries are forced through the `noop` sink so every projection is fully
  * evaluated — a bare `count()` lets Catalyst prune unevaluated columns
  * and under-measures scalar-heavy queries. A warm-up query absorbs
  * first-job JVM/codegen costs so per-query numbers are comparable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    // warm-up: JVM + codegen + first parquet footer reads
    try run(SparkEntry.queries.head._2) catch { case _: Throwable => () }

    // a failed query records -1 (never a small elapsed time that would
    // read as a speedup) and is listed in "failed"
    val outcomes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { run(fn); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
      }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val failed = outcomes.collect { case (n, t) if t < 0 => "\"" + n + "\"" }
    val results = outcomes
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    // sbt appends its own epilogue to stdout, so a printed line is not
    // reliably last — always persist the JSON to a file as well
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile failed: ${e.getMessage}") }
    spark.stop()
    println(json)
  }
}
