package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingHolt
import graft.streaming.StreamingHolt.Tick

/** The streaming Holt smoother must carry its (level, trend) cell across
  * micro-batches, agree with the batch replay fold, and both must equal a
  * plain Scala reference recursion — the same arithmetic the DuckDB
  * recursive-CTE oracle of `stream_holt_replay` replays.
  */
class StreamingHoltSpec extends AnyFunSuite with SparkTestBase {

  private def model(xs: Seq[Double], alpha: Double, beta: Double): Seq[(Double, Double)] =
    xs.tail.scanLeft((xs.head, 0.0)) { case ((l, b), x) =>
      val l1 = alpha * x + (1.0 - alpha) * (l + b)
      (l1, beta * (l1 - l) + (1.0 - beta) * b)
    }

  test("state carries across micro-batches and equals the reference recursion") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[Tick]
    val q = StreamingHolt.holtStream(mem.toDS(), alpha = 0.5, beta = 0.3)
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    try {
      mem.addData(Tick("a", 1, 1, 10.0), Tick("a", 2, 2, 14.0))
      q.processAllAvailable()
      mem.addData(Tick("a", 3, 3, 18.0), Tick("b", 1, 4, 5.0)) // carry + fresh series
      q.processAllAvailable()
      val got = s.sql("select * from holt_out").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(3), r.getDouble(4)))).toMap
      val wantA = model(Seq(10.0, 14.0, 18.0), 0.5, 0.3)
      assert(got(("a", 1)) === wantA(0))
      assert(got(("a", 2)) === wantA(1))
      assert(got(("a", 3)) === wantA(2)) // exact: state crossed the batch gap
      assert(got(("b", 1)) === ((5.0, 0.0))) // fresh series re-seeds
    } finally q.stop()
  }

  test("replay fold equals the streaming fold and tracks a linear ramp") {
    val s = spark
    import s.implicits._
    // a clean ramp x_n = 2n: level ~ ramp, trend -> 2
    val xs = (1 to 60).map(_ * 2.0)
    val ticks = xs.zipWithIndex.map { case (x, i) => Tick("r", i + 1L, i + 1L, x) }
    val got = StreamingHolt.holtReplay(ticks.toDS(), alpha = 0.5, beta = 0.3)
      .collect().sortBy(_.t)
    val want = model(xs, 0.5, 0.3)
    assert(got.map(r => (r.level, r.trend)).toSeq === want)
    assert(math.abs(got.last.trend - 2.0) < 0.01)
    assert(math.abs(got.last.level - 120.0) < 0.1)
  }

  test("replay on real data: per-series seeds and deterministic order") {
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    val ticks = graft.model.TsModel.ts(spark, d)
      .select(col("series_id"), col("t"), col("event_id"),
        col("value").cast("double").as("v")).as[Tick]
    val rows = StreamingHolt.holtReplay(ticks, 0.5, 0.3).collect()
    val first = rows.groupBy(_.series_id).values.map(_.minBy(r => (r.t, r.event_id)))
    // every series seeds at (x_1, 0)
    assert(first.forall(r => r.trend === 0.0))
    assert(rows.length === ticks.count())
  }
}
