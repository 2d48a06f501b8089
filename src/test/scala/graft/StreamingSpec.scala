package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ↔ batch parity: the same event-time transforms must produce
  * identical results whether the events parquet is read as a batch or
  * drained through a stream. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming tumbling agg equals the batch q60 result") {
    // streaming sources read directories; stage the fixture file into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("part-0.parquet"))
    val stream = EventStream.readEvents(spark, dir.toString)
    val q = EventStream.runToMemory(EventStream.tumblingAgg(stream), "tumble", OutputMode.Complete())
    try {
      val streamed = spark.table("tumble")
        .select(col("wstart"), col("event_type"), col("n"))
        .orderBy(col("wstart"), col("event_type"))
        .collect()
      val batch = operators.EventTime.q60Tumbling(spark, sf)
        .select(col("wstart"), col("event_type"), col("n"))
        .collect()
      assert(streamed.length == batch.length)
      assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions with correct stats") {
    import spark.implicits._
    val events = Seq(
      EventStream.Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStream.Event(2, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1, "view", 2.0),
      // > 30 min gap closes the first session
      EventStream.Event(3, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1, "click", 3.0),
      EventStream.Event(4, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 2, "view", 5.0)).toDS()
    val sessions = EventStream.sessionize(events).collect()
    // only CLOSED sessions are emitted (open state stays in the store)
    assert(sessions.length == 1)
    val s = sessions.head
    assert(s.user_id == 1 && s.n_events == 2 && s.sum_value == 3.0)
    assert(s.sess_start.toString.startsWith("2024-01-01 10:00:00"))
    assert(s.sess_end.toString.startsWith("2024-01-01 10:10:00"))
  }
}
