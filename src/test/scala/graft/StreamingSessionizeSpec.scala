package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize
import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.SessEvent

/** The streaming sessionizer must close sessions both in-stream (gap seen
  * inside the event flow) and by watermark timeout (user goes quiet), carry
  * open-session state across micro-batches, and — once flushed — agree with
  * the batch window aggregation row-for-row. Event times are fed
  * non-decreasing across batches, as a watermarked stream requires.
  */
class StreamingSessionizeSpec extends AnyFunSuite with SparkTestBase {

  private def ev(u: Long, t: Long, id: Long, v: Double) =
    SessEvent(u, new Timestamp(t), id, v)

  test("sessions close on gap, survive batch boundaries, and flush on watermark") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[SessEvent]
    val q = StreamingSessionize.sessionizeStream(mem.toDS(), gapMs = 1000L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // batch 1: u1 has two sessions split by an in-batch gap; u2 opens one
      // late enough (timeout 5500 > watermark 5000) that batch 1 cannot
      // flush it yet
      mem.addData(ev(1, 1000, 1, 1.0), ev(1, 1500, 2, 2.0),
                  ev(2, 4500, 3, 8.0), ev(1, 5000, 4, 4.0))
      q.processAllAvailable()
      val afterB1 = s.sql("select * from sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      assert(afterB1.toSet === Set((1L, 1000L, 1500L, 2L, 3.0))) // only the closed one
      // batch 2: u1's open session (started 5000) EXTENDS across the batch
      // boundary; the watermark then passes u2's timeout and flushes it
      mem.addData(ev(1, 5800, 5, 16.0))
      q.processAllAvailable()
      // a further batch advances the watermark past u1's timeout too
      mem.addData(ev(3, 9000, 6, 32.0))
      q.processAllAvailable()
      val rows = s.sql("select * from sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      assert(rows.toSet === Set(
        (1L, 1000L, 1500L, 2L, 3.0),   // in-stream close
        (2L, 4500L, 4500L, 1L, 8.0),   // watermark flush
        (1L, 5000L, 5800L, 2L, 20.0))) // extended across batches, then flushed
    } finally q.stop()
  }

  test("an event below the watermark is dropped as late, not a query-killer") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[SessEvent]
    val q = StreamingSessionize.sessionizeStream(mem.toDS(), gapMs = 1000L)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 100000, 1, 1.0)) // watermark advances to 100000
      q.processAllAvailable()
      // user 2 arrives far below the watermark: must be DROPPED (the state
      // function would otherwise set a timeout below the watermark and
      // Spark would kill the query)
      mem.addData(ev(2, 50000, 2, 8.0))
      q.processAllAvailable()
      mem.addData(ev(3, 200000, 3, 2.0)) // flushes u1 via timeout sweep
      q.processAllAvailable()
      val rows = s.sql("select * from sess_late").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(!rows.exists(_._1 == 2L), s"late event leaked: ${rows.toSeq}")
      assert(rows.contains((1L, 100000L)))
    } finally q.stop()
  }

  test("a NaN session value closes as NaN instead of crashing the query") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[SessEvent]
    val q = StreamingSessionize.sessionizeStream(mem.toDS(), gapMs = 1000L)
      .writeStream.format("memory").queryName("sess_nan")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 1000, 1, Double.NaN))
      q.processAllAvailable()
      mem.addData(ev(1, 5000, 2, 2.0)) // gap closes the NaN session
      q.processAllAvailable()
      val vals = s.sql("select * from sess_nan").collect()
        .map(r => (r.getLong(1), r.getDouble(4))).toMap
      assert(vals(1000L).isNaN)
    } finally q.stop()
  }

  test("sessionizeReplay agrees with the flushed stream and the batch sessionizer") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    // values exact in binary so the raw replay sums equal the stream's
    // 4 dp-rounded emissions without a rounding step
    val data = Seq(
      ev(1, 1000, 1, 1.5), ev(2, 1000, 4, 8.0), ev(1, 1800, 2, 2.25),
      ev(2, 2500, 5, 16.0), ev(2, 2600, 6, 0.5), ev(1, 4000, 3, 4.0),
      ev(3, 500, 9, 0.125))
    val replayed = StreamingSessionize.sessionizeReplay(data.toDS(), gapMs = 1000L)
      .collect().map(c => (c.user_id, c.t_start, c.t_end, c.n_events, c.session_value))
      .toSet
    val mem = MemoryStream[SessEvent]
    val q = StreamingSessionize.sessionizeStream(mem.toDS(), gapMs = 1000L)
      .writeStream.format("memory").queryName("sess_replay_parity")
      .outputMode("append").start()
    try {
      data.sortBy(e => e.ts.getTime).grouped(3).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      mem.addData(ev(99, 1000000, 7, 0.0)); q.processAllAvailable()
      mem.addData(ev(99, 1000001, 8, 0.0)); q.processAllAvailable()
      val streamed = s.sql("select * from sess_replay_parity where user_id < 99").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(replayed === streamed)
      val batchDf = data.toDF()
        .select(col("user_id"), unix_millis(col("ts")).as("t"),
                col("event_id"), col("value"))
      val batched = Sessionize.sessions(batchDf, gapMs = 1000L)
        .select("user_id", "t_start", "t_end", "n_events", "session_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(replayed === batched)
    } finally q.stop()
  }

  test("flushed stream agrees with the batch sessionizer row-for-row") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val data = Seq(
      ev(1, 1000, 1, 1.5), ev(2, 1000, 4, 8.0), ev(1, 1800, 2, 2.25),
      ev(2, 2500, 5, 16.0), ev(2, 2600, 6, 0.5), ev(1, 4000, 3, 4.0))
    val mem = MemoryStream[SessEvent]
    val q = StreamingSessionize.sessionizeStream(mem.toDS(), gapMs = 1000L)
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      data.grouped(2).foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }
      // advance the watermark far enough that every open session times out
      mem.addData(ev(99, 1000000, 7, 0.0)); q.processAllAvailable()
      mem.addData(ev(99, 1000001, 8, 0.0)); q.processAllAvailable()
      val streamed = s.sql("select * from sess_parity where user_id < 99").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val batchDf = data.toDF()
        .select(col("user_id"), unix_millis(col("ts")).as("t"),
                col("event_id"), col("value"))
      val batched = Sessionize.sessions(batchDf, gapMs = 1000L)
        .select("user_id", "t_start", "t_end", "n_events", "session_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(streamed === batched)
    } finally q.stop()
  }
}
