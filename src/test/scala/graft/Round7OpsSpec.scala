package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lttb

class Round7OpsSpec extends AnyFunSuite with SparkTestBase {

  test("m4: per-bucket min/max/first/last match a per-group model, ties by event_id") {
    val s = spark
    import s.implicits._
    // bucket width 10: rows at t 0-9 -> bucket 0, 10-19 -> bucket 1.
    // Bucket 0 of series a has a t-tie at 0 (event_id decides first)
    // and its max in the middle; bucket 1 is a single row.
    val rows = Seq(
      ("a", 0L, 5.0, 2L), ("a", 0L, 3.0, 1L), ("a", 4L, 9.0, 3L),
      ("a", 9L, -1.0, 4L), ("a", 13L, 7.0, 5L),
      ("b", 2L, 2.0, 6L), ("b", 8L, 1.0, 7L))
    val df = rows.toDF("series_id", "t", "value", "event_id")
    val out = Lttb.m4(df, spanMs = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
         r.getDouble(6), r.getDouble(7))).toMap
    // model: group rows by (series, t div 10) and fold explicitly
    val model = rows.groupBy { case (sid, t, _, _) => (sid, t / 10) }
      .map { case ((sid, b), es) =>
        val sorted = es.sortBy { case (_, t, _, id) => (t, id) }
        (sid, b) -> (b * 10, es.size.toLong, es.map(_._3).min, es.map(_._3).max,
          sorted.head._3, sorted.last._3)
      }
    assert(out === model)
    assert(out(("a", 0L)) === ((0L, 4L, -1.0, 9.0, 3.0, -1.0)))
    assert(out(("a", 1L)) === ((10L, 1L, 7.0, 7.0, 7.0, 7.0)))
  }

  test("count-min: estimate never undercounts, and is exact when no collision") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("agg_count_min")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted user ${r.getLong(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("ts_crossings: matches a per-series scala model on the fixture") {
    val s = spark
    import s.implicits._
    val src = graft.model.TsModel.ts(s, "/root/testdata/sf0.001")
      .select("series_id", "t", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val model = src.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._4))
      sorted.zip(sorted.drop(1)).collect {
        case (p, c) if p._3 < 50.0 && c._3 >= 50.0 => (c._1, c._2, c._4, p._3, c._3)
      }
    }.toSet
    val out = SparkEntry.queries("ts_crossings")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(out === model)
    assert(out.nonEmpty)
  }

  test("m4: plan is one partial aggregation, no window exec") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => ("s", i, i.toDouble, i)).toDF("series_id", "t", "value", "event_id")
    val p = Lttb.m4(df, spanMs = 7L).queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p.take(1200))
    assert(p.contains("partial_min_by") || p.contains("partial_minby") ||
      "HashAggregate.*partial".r.findFirstIn(p).isDefined, p.take(1200))
  }
}
