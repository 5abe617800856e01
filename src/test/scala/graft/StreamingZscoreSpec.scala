package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingZscore
import graft.streaming.StreamingZscore.Tick

/** The streaming z-monitor must carry its (n, Σc, Σc²) cell across
  * micro-batches, score each event against strictly-earlier history only,
  * and agree with the window-aggregate batch replay bit-for-bit (the
  * whole point of integer state: no fold-order pinning needed).
  */
class StreamingZscoreSpec extends AnyFunSuite with SparkTestBase {

  test("state carries across micro-batches; z scores history only") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[Tick]
    val q = StreamingZscore.zscoreStream(mem.toDS())
      .writeStream.format("memory").queryName("z_out")
      .outputMode("append").start()
    try {
      mem.addData(Tick("a", 1, 1, 1000L), Tick("a", 2, 2, 1200L))
      q.processAllAvailable()
      mem.addData(Tick("a", 3, 3, 1100L), Tick("a", 4, 4, 5000L))
      q.processAllAvailable()
      val rows = s.sql("select * from z_out").collect()
        .map(r => r.getLong(1) -> (if (r.isNullAt(4)) null else r.getDouble(4))).toMap
      // events 1, 2: history has < 2 points -> NULL
      assert(rows(1L) === null && rows(2L) === null)
      // event 3: history {10.00, 12.00}, mean 11, sd sqrt(2) -> z = 0
      //   (11.00 - 11.00) / 1.4142 = 0.0
      assert(rows(3L) === 0.0)
      // event 4: history {10, 12, 11}, mean 11, sd 1 -> z = 39
      assert(rows(4L) === 39.0)
    } finally q.stop()
  }

  test("constant history (zero variance) yields NULL, then unblocks") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[Tick]
    val q = StreamingZscore.zscoreStream(mem.toDS())
      .writeStream.format("memory").queryName("z_const")
      .outputMode("append").start()
    try {
      mem.addData(Tick("a", 1, 1, 500L), Tick("a", 2, 2, 500L),
        Tick("a", 3, 3, 500L), Tick("a", 4, 4, 700L))
      q.processAllAvailable()
      val rows = s.sql("select event_id, z from z_const").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(rows(3L) === null) // history {5, 5}: sd = 0 -> no score
      assert(rows(4L) === null) // history {5, 5, 5}: still sd = 0
    } finally q.stop()
  }

  test("stream equals the window-aggregate replay on real data") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val ticks = graft.model.TsModel.ts(spark, "/root/testdata/sf0.001")
      .select(col("series_id"), col("t"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .as[Tick]
    val want = StreamingZscore.zscoreReplay(ticks).collect()
      .map(r => (r.series_id, r.event_id) -> ((r.z, r.anomaly))).toMap
    val mem = MemoryStream[Tick]
    val q = StreamingZscore.zscoreStream(mem.toDS())
      .writeStream.format("memory").queryName("z_replay")
      .outputMode("append").start()
    try {
      val all = ticks.collect()
      val (b1, b2) = all.splitAt(all.length / 2) // cross-batch boundary
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      val got = s.sql("select * from z_replay").as[StreamingZscore.ZRow]
        .collect().map(r => (r.series_id, r.event_id) -> ((r.z, r.anomaly))).toMap
      assert(got.size === want.size)
      assert(got === want)
    } finally q.stop()
  }
}
