package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCusum
import graft.streaming.StreamingCusum.Tick

/** The streaming CUSUM must carry its (S, minS) cell across micro-batches,
  * agree with the batch replay fold, and both must equal the closed-form
  * window expression `hi = S - min(0, prefix-min S)` the oracle uses.
  */
class StreamingCusumSpec extends AnyFunSuite with SparkTestBase {

  test("state carries across micro-batches and equals the textbook recursion") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[Tick]
    val q = StreamingCusum.cusumStream(mem.toDS(), mu0 = 10L)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    try {
      mem.addData(Tick("a", 1, 1, 12L), Tick("a", 2, 2, 14L))
      q.processAllAvailable()
      mem.addData(Tick("a", 3, 3, 5L), Tick("a", 4, 4, 13L)) // carry-over
      q.processAllAvailable()
      val hi = s.sql("select * from cusum_out").collect()
        .map(r => r.getLong(1) -> r.getLong(4)).toMap
      // textbook recursion hi' = max(0, hi + (c - mu0)):
      // 2, 6, max(0,6-5)=1, 4
      assert(hi === Map(1L -> 2L, 2L -> 6L, 3L -> 1L, 4L -> 4L))
    } finally q.stop()
  }

  test("negative excursions clamp at zero via the running-min seed") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[Tick]
    val q = StreamingCusum.cusumStream(mem.toDS(), mu0 = 10L)
      .writeStream.format("memory").queryName("cusum_neg")
      .outputMode("append").start()
    try {
      mem.addData(Tick("a", 1, 1, 0L), Tick("a", 2, 2, 0L), Tick("a", 3, 3, 25L))
      q.processAllAvailable()
      val hi = s.sql("select * from cusum_neg").collect()
        .map(r => r.getLong(1) -> r.getLong(4)).toMap
      // S: -10, -20, -5; minS: -10, -20, -20 -> hi 0, 0, 15
      assert(hi === Map(1L -> 0L, 2L -> 0L, 3L -> 15L))
    } finally q.stop()
  }

  test("replay fold equals the closed-form window on real data") {
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    val ticks = graft.model.TsModel.ts(spark, d)
      .select(col("series_id"), col("t"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
    val got = StreamingCusum.cusumReplay(ticks.as[Tick], mu0 = 5000L).toDF()
      .select("series_id", "event_id", "hi")
      .as[(String, Long, Long)].collect().toMap2
    val w = Window.partitionBy("series_id").orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = ticks
      .withColumn("s", sum(col("c") - 5000L).over(w))
      .withColumn("hi", col("s") - least(min("s").over(w), lit(0L)))
      .select("series_id", "event_id", "hi")
      .as[(String, Long, Long)].collect().toMap2
    assert(got === want)
  }

  private implicit class Tup3Ops(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[(String, Long), Long] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
