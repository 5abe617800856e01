package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingRate
import graft.streaming.StreamingRate.CTick

/** The streaming counter-rate must carry its residue across micro-batches,
  * detect wraps as resets, and agree with the batch replay on the same
  * history.
  */
class StreamingRateSpec extends AnyFunSuite with SparkTestBase {

  test("counter residue carries across micro-batches; wrap reads as a reset") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[CTick]
    val q = StreamingRate.rateStream(mem.toDS())
      .writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    try {
      // 600k + 300k stay below the 1M modulus; the 400k in batch 2 wraps
      mem.addData(CTick("a", 1, 1, 600000L), CTick("a", 2, 2, 300000L))
      q.processAllAvailable()
      mem.addData(CTick("a", 3, 3, 400000L), CTick("b", 1, 4, 7L))
      q.processAllAvailable()
      val rows = s.sql("select * from rate_out").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      assert(rows(("a", 1L)) === ((600000L, 0L)))      // first event: d = 0
      assert(rows(("a", 2L)) === ((900000L, 300000L))) // monotone increase
      // 900k + 400k = 1.3M -> residue 300k < prev 900k: wrap, d = ctr
      assert(rows(("a", 3L)) === ((300000L, 300000L)))
      assert(rows(("b", 1L)) === ((7L, 0L)))           // fresh series
    } finally q.stop()
  }

  test("stream output equals the batch replay on an out-of-order history") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val hist = Seq(
      CTick("a", 5, 2, 999999L), CTick("a", 1, 1, 3L), CTick("a", 5, 3, 10L),
      CTick("b", 2, 4, 500000L), CTick("b", 3, 5, 600000L))
    val mem = MemoryStream[CTick]
    val q = StreamingRate.rateStream(mem.toDS())
      .writeStream.format("memory").queryName("rate_par")
      .outputMode("append").start()
    try {
      mem.addData(hist: _*)
      q.processAllAvailable()
      val got = s.sql("select * from rate_par").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
          (r.getLong(3), r.getLong(4))).toMap
      val want = StreamingRate.rateReplay(hist.toDS()).collect()
        .map(x => (x.series_id, x.t, x.event_id) -> (x.ctr, x.d)).toMap
      assert(got === want)
      assert(want(("a", 5L, 2L))._1 === 2L) // 3 + 999999 wraps to 2
    } finally q.stop()
  }
}
