package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingStats
import graft.streaming.StreamingStats.Tick

/** The streaming EWMA must carry its state ACROSS micro-batches (one level
  * cell per series) and agree with the batch recursion on the same data.
  */
class StreamingStatsSpec extends AnyFunSuite with SparkTestBase {

  test("per-series level persists across micro-batches and matches the recursion") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[Tick]
    val q = StreamingStats.ewmaStream(mem.toDS(), alpha = 0.2)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      mem.addData(Tick("a", 1, 1, 10.0), Tick("a", 2, 2, 20.0), Tick("b", 1, 3, 5.0))
      q.processAllAvailable()
      mem.addData(Tick("a", 3, 4, 30.0)) // state from batch 1 must carry over
      q.processAllAvailable()
      val rows = s.sql("select * from ewma_out").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
      assert(rows(("a", 1L)) === 10.0)
      assert(rows(("a", 2L)) === 12.0)          // 0.8*10 + 0.2*20
      assert(math.abs(rows(("a", 3L)) - 15.6) < 1e-12) // 0.8*12 + 0.2*30
      assert(rows(("b", 1L)) === 5.0)
    } finally q.stop()
  }

  test("ties at the same t fold in event_id order, matching the batch window") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[Tick]
    val q = StreamingStats.ewmaStream(mem.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ewma_ties")
      .outputMode("append").start()
    try {
      // Same t=1; event_id order (10 then 20) must decide the fold order.
      mem.addData(Tick("a", 1, 2, 20.0), Tick("a", 1, 1, 10.0))
      q.processAllAvailable()
      val rows = s.sql("select * from ewma_ties").collect()
        .map(r => r.getLong(2) -> r.getDouble(4)).toMap
      assert(rows(1L) === 10.0)   // first by event_id initializes
      assert(rows(2L) === 15.0)   // 0.5*10 + 0.5*20
    } finally q.stop()
  }

  test("a NaN first value still initializes state instead of resetting forever") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[Tick]
    val q = StreamingStats.ewmaStream(mem.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ewma_nan")
      .outputMode("append").start()
    try {
      mem.addData(Tick("a", 1, 1, Double.NaN))
      q.processAllAvailable()
      mem.addData(Tick("a", 2, 2, 8.0))
      q.processAllAvailable()
      val rows = s.sql("select * from ewma_nan").collect()
        .map(r => r.getLong(2) -> r.getDouble(4)).toMap
      // NaN propagates through the recursion (as the batch fold would) —
      // it must NOT silently re-initialize the level to 8.0.
      assert(rows(1L).isNaN)
      assert(rows(2L).isNaN)
    } finally q.stop()
  }
}
