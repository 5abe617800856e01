package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming extension beyond the reference (SURVEY §2.4 notes the absence):
  * stream-stream joins with event-time range conditions — the Spark-native
  * form of "correlate two live series", which the reference can only do by
  * polling two read queries. State on both sides is bounded by the
  * watermarks plus the interval bound, so the join survives unbounded
  * streams — the property that matters at production fan-in.
  */
class StreamJoinSpec extends AnyFunSuite with SparkTestBase {

  test("stream-stream interval join: clicks attach to the view within 2 minutes") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val views = MemoryStream[(Long, Long)]  // (t_ms, user)
    val clicks = MemoryStream[(Long, Long)]
    val v = views.toDF().toDF("vt_ms", "v_user")
      .withColumn("v_ts", timestamp_millis(col("vt_ms")))
      .withWatermark("v_ts", "1 minute")
    val c = clicks.toDF().toDF("ct_ms", "c_user")
      .withColumn("c_ts", timestamp_millis(col("ct_ms")))
      .withWatermark("c_ts", "1 minute")
    val joined = v.join(c,
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") && col("c_ts") <= col("v_ts") + expr("INTERVAL 2 MINUTES"))
      .select(col("v_user").as("user"), col("vt_ms"), col("ct_ms"))
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      val base = 1700000040000L
      val m = 60000L
      views.addData((base, 7L), (base, 8L))
      clicks.addData((base + m, 7L))          // within interval -> joins
      q.processAllAvailable()
      clicks.addData((base + 5 * m, 8L))      // outside interval -> no join
      q.processAllAvailable()
      // advance both watermarks so all pending state resolves
      views.addData((base + 30 * m, 99L))
      clicks.addData((base + 30 * m, 98L))
      q.processAllAvailable()
      val rows = s.sql("select * from sj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set((7L, base, base + m)))
    } finally q.stop()
  }

  test("stream-static join: the live stream enriches against the KV dimension") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val dim = Seq((7L, "gold"), (8L, "trial")).toDF("user", "tier")
    val ev = MemoryStream[(Long, Long, Double)] // (t_ms, user, value)
    val out = ev.toDF().toDF("t_ms", "user", "value")
      .join(broadcast(dim), Seq("user"), "left")
      .select(col("user"), col("value"), coalesce(col("tier"), lit("none")).as("tier"))
    val q = out.writeStream.format("memory").queryName("ss_out")
      .outputMode("append").start()
    try {
      ev.addData((1L, 7L, 1.5), (2L, 9L, 2.5))
      q.processAllAvailable()
      val rows = s.sql("select * from ss_out").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      assert(rows === Set((7L, 1.5, "gold"), (9L, 2.5, "none")))
    } finally q.stop()
  }
}
