package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The Spark 4 transformWithState (arbitrary-state v2) surface: per-user
  * running totals through a StatefulProcessor with a typed ValueState,
  * proven equal to the batch aggregate after the stream drains. */
class TransformWithStateSpec extends AnyFunSuite {
  import TestSpark._

  test("runningTotals: v2 state API matches the batch aggregate across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events_tws")
    def write(name: String, events: Seq[EventStream.Event]): Unit =
      events.toDS().coalesce(1).write.mode("append").parquet(dir.resolve(name).toString)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val batch0 = Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.25),
      EventStream.Event(2, ts("2024-01-01 10:01:00"), 2, "view", 2.5),
      EventStream.Event(3, ts("2024-01-01 10:02:00"), 1, "view", 0.75))
    val batch1 = Seq(
      EventStream.Event(4, ts("2024-01-01 10:03:00"), 1, "click", 3.0),
      EventStream.Event(5, ts("2024-01-01 10:04:00"), 3, "click", 4.5))
    write("f0", batch0)
    write("f1", batch1)
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(Seq(EventStream.Event(0, new java.sql.Timestamp(0), 0, "", 0.0)).toDS().schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.resolve("*").toString)
        .as[EventStream.Event]
      val q = EventStream.runToMemory(
        EventStream.runningTotals(stream).toDF(), "tws_totals", OutputMode.Update())
      try {
        val updates = spark.table("tws_totals")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // state accumulated ACROSS micro-batches: user 1 must show an
        // update with all 3 of its events even though they span batches
        val finalPerUser = updates.groupBy(_._1).view
          .mapValues(rows => rows.maxBy(_._2)).toMap
        val expected = (batch0 ++ batch1).groupBy(_.user_id).map { case (u, es) =>
          u -> (es.size.toLong,
            es.map(e => math.floor(e.value * 1000000.0 + 0.5).toLong).sum)
        }
        expected.foreach { case (u, (n, sumMicro)) =>
          val (_, gotN, gotSum) = finalPerUser(u)
          assert(gotN == n, s"user $u count: $gotN != $n")
          assert(gotSum == sumMicro, s"user $u sum: $gotSum != $sumMicro")
        }
        // user 1 received at least two updates (one per micro-batch seen)
        assert(updates.count(_._1 == 1L) >= 2,
          "Update mode must emit a row per micro-batch that touched the key")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sessionizeV2: in-batch gaps close inline, idle sessions close by event-time timer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events_tws_sess")
    def write(name: String, events: Seq[EventStream.Event]): Unit =
      events.toDS().coalesce(1).write.mode("append").parquet(dir.resolve(name).toString)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two events then a >30min gap inside the stream → inline close
    // user 2: a single event, then silence → ONLY an expired timer can close it
    write("f0", Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStream.Event(2, ts("2024-01-01 10:10:00"), 1, "view", 2.0),
      EventStream.Event(3, ts("2024-01-01 10:05:00"), 2, "view", 5.0)))
    write("f1", Seq(
      EventStream.Event(4, ts("2024-01-01 11:00:00"), 1, "click", 3.0)))
    // a third batch pushes the watermark past user 2's end + gap so the
    // registered timer actually expires
    write("f2", Seq(
      EventStream.Event(5, ts("2024-01-01 12:00:00"), 3, "click", 7.0)))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(Seq(EventStream.Event(0, new java.sql.Timestamp(0), 0, "", 0.0)).toDS().schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.resolve("*").toString)
        .as[EventStream.Event]
      val q = EventStream.runToMemory(
        EventStream.sessionizeV2(stream).toDF(), "tws_sessions")
      try {
        val rows = spark.table("tws_sessions")
          .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
            r.getLong(3), r.getDouble(4)))
        // user 1's first session closed INLINE by the 50-min in-stream gap
        assert(rows.exists(r => r._1 == 1L && r._3 == 2L && r._4 == 3.0),
          s"user 1's 2-event session must close inline, got ${rows.toSeq}")
        // user 2's lone-event session closed by the EXPIRED TIMER
        assert(rows.exists(r => r._1 == 2L && r._3 == 1L && r._4 == 5.0),
          s"user 2's idle session must close via handleExpiredTimer, got ${rows.toSeq}")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("attributionStream: v2 ListState attribution matches batch q216 on the fixture") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // drive the REAL events fixture in two time-ordered micro-batches so
    // touch buffers must survive (and be watermark-GC'd) across batches
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val cut = ev.agg(expr("timestampadd(SECOND, 1, min(ts) + (max(ts) - min(ts)) / 2)"))
      .head().getTimestamp(0)
    val dir = java.nio.file.Files.createTempDirectory("events_tws_attr")
    ev.filter(col("ts") <= lit(cut)).coalesce(1)
      .write.parquet(dir.resolve("f0").toString)
    ev.filter(col("ts") > lit(cut)).coalesce(1)
      .write.parquet(dir.resolve("f1").toString)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(Seq(EventStream.Event(0, new java.sql.Timestamp(0), 0, "", 0.0)).toDS().schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.resolve("*").toString)
        .as[EventStream.Event]
      val q = EventStream.runToMemory(
        EventStream.attributionStream(stream).toDF(), "tws_attr")
      try {
        val got = spark.table("tws_attr")
          .groupBy(col("touch_type"))
          .agg(count(lit(1)).as("n_touches"),
            countDistinct(col("conv_id")).as("n_conversions"),
            operators.Det.dsum(col("w")).as("credit"))
          .orderBy(col("touch_type"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        val want = operators.Behavior.q216MultitouchAttribution(spark, sf)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        assert(got.nonEmpty, "attribution stream produced no credits on the fixture")
        assert(got.sameElements(want),
          s"streaming attribution != batch q216:\n got ${got.toSeq}\nwant ${want.toSeq}")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      spark.catalog.clearCache()
    }
  }
}
