package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

class SessionizeSpec extends AnyFunSuite with SparkTestBase {

  test("gap-based sessions split exactly at the gap threshold") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 0L, 1.0, 1L), (1L, 1000L, 2.0, 2L),      // session 1
      (1L, 10000L, 3.0, 3L),                          // gap 9s > 5s -> session 2
      (2L, 0L, 5.0, 4L)                               // other user
    ).toDF("user_id", "t", "value", "event_id")
    val got = Sessionize.sessions(ev, gapMs = 5000L)
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.toSeq === Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 5.0)))
  }

  test("salted aggregation equals direct aggregation on skewed data") {
    val s = spark
    import s.implicits._
    // heavy hitter: 5000 rows on one key, a handful elsewhere
    val rows = Seq.tabulate(5000)(i => ("hot", i.toDouble)) ++
      Seq(("a", 1.0), ("b", 2.0), ("b", 3.0))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("count_v"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Sessionize.saltedSumCount(df, col("k"), col("v"), saltBuckets = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }
}
