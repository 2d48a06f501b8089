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

  test("foreachBatch streaming upsert into silver equals the batch MERGE") {
    import graft.pipeline.{Medallion, TableConfig}
    val root = java.nio.file.Files.createTempDirectory("stream_upsert")
    val srcDir = root.resolve("src"); java.nio.file.Files.createDirectory(srcDir)
    val silverDir = s"$root/silver"; val ckDir = s"$root/ck"
    val cfg = TableConfig("events_silver",
      primaryKey = Seq("user_id"), orderByCol = Seq("event_id"))

    def stage(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = root.resolve(s"stage_$name")
      Tables.events(spark, sf).filter(cond)
        .select(col("event_id"), (unix_micros(col("ts")) * 1000).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, srcDir.resolve(s"$name.parquet"))
    }

    // the streaming CDC-consumer shape: each micro-batch MERGEs into the
    // stored silver (latest row per user wins by event_id) instead of
    // appending — the reference's full-overwrite refresh, made incremental
    def startQuery() = EventStream.readEvents(spark, srcDir.toString)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val existing =
          try spark.read.parquet(silverDir)
          catch { case _: Throwable => spark.emptyDataFrame }
        val merged =
          if (existing.isEmpty) Medallion.dedupByPk(batch, cfg)
          else Medallion.upsert(existing, batch, cfg)
        val tmp = s"$silverDir.tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val hfs = new org.apache.hadoop.fs.Path(silverDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        hfs.delete(new org.apache.hadoop.fs.Path(silverDir), true)
        hfs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(silverDir))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

    stage(col("event_id") < 500, "b1")
    val q1 = startQuery(); q1.awaitTermination()
    // restart with a second delta — checkpoint must skip b1, and the
    // second MERGE must update existing users rather than duplicate them
    stage(col("event_id") >= 500, "b2")
    val q2 = startQuery(); q2.awaitTermination()

    val got = spark.read.parquet(silverDir)
      .select(col("user_id"), col("event_id"))
      .orderBy(col("user_id")).collect()
    val want = Medallion.dedupByPk(
        Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("event_type")),
        cfg)
      .select(col("user_id"), col("event_id"))
      .orderBy(col("user_id")).collect()
    assert(got.map(_.toString).sameElements(want.map(_.toString)),
      "streamed incremental MERGE must equal the one-shot batch dedup")
  }

  test("sessionize state survives a kill-and-restart between micro-batches") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sess_restart")
    val srcDir = root.resolve("src"); java.nio.file.Files.createDirectory(srcDir)
    val outDir = s"$root/out"; val ckDir = s"$root/ck"

    def write(name: String, events: Seq[EventStream.Event]): Unit =
      events.toDS().coalesce(1).write.parquet(srcDir.resolve(name).toString)

    def startQuery() = {
      val stream = spark.readStream
        .schema(Seq(EventStream.Event(0, new java.sql.Timestamp(0), 0, "", 0.0)).toDS().schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.resolve("*").toString)
        .as[EventStream.Event]
      EventStream.sessionize(stream).toDF()
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // batch 1: an OPEN session for user 1 (2 events, ends 10:10)
    write("f0", Seq(
      EventStream.Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStream.Event(2, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1, "view", 2.0)))
    val q1 = startQuery(); q1.awaitTermination()

    // kill/restart: batch 2 CONTINUES the session (10:20, gap < 30 min),
    // then a far event supersedes it. The emitted session can only have
    // n_events=3 / start=10:00 if the flatMapGroupsWithState state store
    // was recovered from the checkpoint — a lost state would emit a
    // 1-event session starting 10:20 instead.
    write("f1", Seq(
      EventStream.Event(3, java.sql.Timestamp.valueOf("2024-01-01 10:20:00"), 1, "click", 4.0),
      EventStream.Event(4, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1, "click", 9.0)))
    val q2 = startQuery(); q2.awaitTermination()

    val sessions = spark.read.parquet(outDir).as[EventStream.SessionOut].collect()
    assert(sessions.length == 1, sessions.mkString("; "))
    val s = sessions.head
    assert(s.user_id == 1 && s.n_events == 3 && s.sum_value == 7.0)
    assert(s.sess_start.toString.startsWith("2024-01-01 10:00:00"))
    assert(s.sess_end.toString.startsWith("2024-01-01 10:20:00"))
  }
}
