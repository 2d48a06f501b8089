package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** File-sink streaming with checkpointing: restarts must not duplicate or
  * lose data (the exactly-once file-sink contract). */
class StreamingSinkSpec extends AnyFunSuite {
  import TestSpark._

  test("parquet file sink + checkpoint: restart resumes without duplicates") {
    val root = java.nio.file.Files.createTempDirectory("stream_sink")
    val srcDir = root.resolve("src"); java.nio.file.Files.createDirectory(srcDir)
    val outDir = s"$root/out"; val ckDir = s"$root/ck"

    def startQuery() = EventStream.readEvents(spark, srcDir.toString)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .start()

    // the file-stream source lists files at the top level: stage each
    // batch's part files directly into srcDir
    def stage(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = root.resolve(s"stage_$name")
      Tables.events(spark, sf).filter(cond)
        .select(col("event_id"), (unix_micros(col("ts")) * 1000).as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, srcDir.resolve(s"$name.parquet"))
    }
    val all = Tables.events(spark, sf)
    stage(col("event_id") < 500, "b1")
    val q1 = startQuery(); q1.awaitTermination()

    // restart with batch 2 added — checkpoint must skip b1
    stage(col("event_id") >= 500, "b2")
    val q2 = startQuery(); q2.awaitTermination()

    val out = spark.read.parquet(outDir)
    assert(out.count() == all.count(), "row count after restart")
    assert(out.select(countDistinct(col("event_id"))).head().getLong(0) == all.count(),
      "no duplicated event_ids across restarts")
  }
}
