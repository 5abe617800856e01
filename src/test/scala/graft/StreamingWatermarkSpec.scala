package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingWatermark
import graft.streaming.StreamingWatermark.Arrival

/** Per-event watermark admission: the one-long state must carry across
  * micro-batches, and the bucketed batch replay must be bit-identical to
  * both the naive global window form and the sequential stream fold.
  */
class StreamingWatermarkSpec extends AnyFunSuite with SparkTestBase {

  test("admission drops exactly the >delay laggards, carries across batches") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[Arrival]
    val q = StreamingWatermark.admitStream(mem.toDS(), delayMs = 100L)
      .writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      // arrival order = ak: t=500 advances the max; t=390 lags 110 > 100
      // -> dropped; t=400 lags exactly 100 -> kept (>= boundary)
      mem.addData(Arrival(500L, 1, 1L, 10L), Arrival(390L, 2, 1L, 20L))
      q.processAllAvailable()
      mem.addData(Arrival(400L, 3, 1L, 30L), Arrival(900L, 4, 1L, 40L))
      q.processAllAvailable()
      val kept = s.sql("select event_id, kept from wm_out").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(kept === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
    } finally q.stop()
  }

  test("bucketed replay == naive global window == stream fold on real data") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val arr = ev.select(graft.model.TimeCols.millis(ev, "ts").as("t"),
        col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .withColumn("ak",
        col("t") + expr("(event_id * 2654435761L) % 4294967296L % 7200000L"))
    val bucketed = StreamingWatermark.admittedBucketed(arr, delayMs = 3600000L)
      .select("event_id", "kept").as[(Long, Boolean)].collect().toMap
    // naive form: one global window (the plan the bucketed rewrite kills)
    val wNaive = Window.orderBy(col("ak").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = arr.withColumn("mp", max("t").over(wNaive))
      .select(col("event_id"),
        (col("mp").isNull || col("t") >= col("mp") - 3600000L).as("kept"))
      .as[(Long, Boolean)].collect().toMap
    assert(bucketed === naive)
    // sequential stream fold, split across two micro-batches mid-history
    val mem = MemoryStream[Arrival]
    val q = StreamingWatermark.admitStream(mem.toDS(), delayMs = 3600000L)
      .writeStream.format("memory").queryName("wm_replay")
      .outputMode("append").start()
    try {
      val all = arr.as[Arrival].collect().sortBy(a => (a.ak, a.event_id))
      val (b1, b2) = all.splitAt(all.length / 2)
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val got = s.sql("select event_id, kept from wm_replay").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got === naive)
    } finally q.stop()
  }
}
