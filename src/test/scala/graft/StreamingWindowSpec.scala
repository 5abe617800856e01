package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T7/T8 extension (absent in the reference — SURVEY §2.4): event-time
  * tumbling windows with a watermark over the TS stream. The reference has
  * no windowed aggregates and no late-data policy beyond compaction; on
  * Spark both are one declaration. This spec pins the semantics we expose:
  * per-(window, series) counts in append mode, late rows beyond the
  * watermark dropped.
  */
class StreamingWindowSpec extends AnyFunSuite with SparkTestBase {

  private case class Tick(ts: Timestamp, series_id: String, value: Double)

  test("tumbling window + watermark: closed windows emit, late data is dropped") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val agged = mem.toDF().toDF("t_ms", "series_id", "value")
      .withColumn("ts", timestamp_millis(col("t_ms")))
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute"), col("series_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("window.start").cast("long").as("w"), col("series_id"), col("n"), col("v"))
    val q = agged.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      val base = 1700000040000L // minute-aligned (divisible by 60000)
      val m = 60000L
      // batch 1: two events in window 0, one in window 1
      mem.addData((base, "a", 1.0), (base + 1000, "a", 2.0), (base + m, "a", 10.0))
      q.processAllAvailable()
      // batch 2: advance watermark far past window 0 and 1
      mem.addData((base + 10 * m, "a", 5.0))
      q.processAllAvailable()
      // batch 3: a LATE event for window 0 — behind the watermark, dropped
      mem.addData((base + 1000, "a", 100.0))
      q.processAllAvailable()
      // batch 4: push watermark further so nothing else is pending
      mem.addData((base + 20 * m, "a", 6.0))
      q.processAllAvailable()
      val rows = s.sql("select * from win_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      // window 0 closed with the ORIGINAL two rows only (late 100.0 ignored)
      assert(rows.contains((base / 1000, "a", 2L, 3.0)))
      // window 1 closed with its single row
      assert(rows.contains(((base + m) / 1000, "a", 1L, 10.0)))
      assert(!rows.exists(_._4 == 103.0)) // late row never merged
    } finally q.stop()
  }

  test("session windows: gap-based sessions close under the watermark") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val agged = mem.toDF().toDF("t_ms", "user_id", "value")
      .withColumn("ts", timestamp_millis(col("t_ms")))
      .withWatermark("ts", "30 seconds")
      .groupBy(session_window(col("ts"), "10 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("session_window.start").cast("long").as("start"),
              col("session_window.end").cast("long").as("end"),
              col("user_id"), col("n"), col("v"))
    val q = agged.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      // session 1: three events within 10s gaps; then a 60s silence
      mem.addData((base, "u", 1.0), (base + 5000, "u", 2.0), (base + 12000, "u", 3.0))
      q.processAllAvailable()
      // session 2 far later: closes session 1 once the watermark passes
      mem.addData((base + 120000, "u", 9.0))
      q.processAllAvailable()
      mem.addData((base + 300000, "u", 1.0)) // push watermark again
      q.processAllAvailable()
      val rows = s.sql("select * from sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      // one merged session covering the three events: [base, base+12s+10s)
      val sess1 = rows.find(_._4 == 3L).get
      assert(sess1._1 === base / 1000)
      assert(sess1._2 === (base + 22000) / 1000) // last event + gap
      assert(sess1._5 === 6.0)
    } finally q.stop()
  }
}
