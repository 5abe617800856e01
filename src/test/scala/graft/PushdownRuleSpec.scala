package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PushMillisDivPredicates

class PushdownRuleSpec extends AnyFunSuite with SparkTestBase {

  private val SINCE = 1705708800000L

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PushMillisDivPredicates
    try f finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PushMillisDivPredicates)
    }
  }

  test("free-form SQL time predicates on t reach parquet PushedFilters") {
    withRule {
      GraftFunctions.registerViews(spark, "/root/testdata/sf0.001")
      val df = spark.sql(s"SELECT series_id, t, value FROM ts WHERE t >= $SINCE")
      val plan = df.queryExecution.executedPlan.toString
      // under the shipped Spark the events column reads as timestamp_ntz
      // and the pushed bound is an ntz literal (2024-01-20T00:00)
      assert(plan.contains("GreaterThanOrEqual(ts,"), plan)
      // and the rewrite preserves results exactly
      val ev = Tables.events(spark, "/root/testdata/sf0.001")
      val expected = ev.filter(graft.model.TimeCols.millis(ev, "ts") >= SINCE).count()
      assert(df.count() === expected)
    }
  }

  test("rewrites are exact on all comparison shapes incl. negatives left untouched") {
    val s = spark
    import s.implicits._
    // timestamps straddling zero exercise trunc-vs-floor edge cases
    val rows = Seq(-2500000L, -1000000L, -1L, 0L, 1L, 999999L, 1000000L,
      1500000L, 2000000L, 2999999L, 3000000L).map(ns => Tuple1(ns))
    val df = rows.toDF("ts_ns")
    val t = expr("ts_ns div 1000000")
    def check(pred: org.apache.spark.sql.Column): Unit = {
      val base = df.filter(pred).select("ts_ns").collect().map(_.getLong(0)).toSet
      val rewritten = withRule {
        df.filter(pred).select("ts_ns").collect().map(_.getLong(0)).toSet
      }
      assert(rewritten === base, s"pred: $pred")
    }
    for (v <- Seq(1L, 2L)) {
      check(t >= v); check(t > v); check(t < v); check(t <= v); check(t === v)
      check(lit(v) >= t); check(lit(v) > t); check(lit(v) < t); check(lit(v) <= t)
    }
    check(t >= 0L) // v < 1: rule must leave it alone (still correct answer)
  }

  test("ntz rewrites are exact on all comparison shapes incl. negative bounds") {
    val s = spark
    import s.implicits._
    // micros straddling ms boundaries on both sides of zero: floor(us/1000)
    // differs from truncation below zero, which the ntz shape must honor
    val micros = Seq(-2000001L, -2000000L, -1001L, -1000L, -1L, 0L, 1L,
      999L, 1000L, 1999L, 2000L, 2999L, 3000L)
    val df = micros.map(Tuple1(_)).toDF("us")
      .select(col("us"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    val t = unix_millis(col("ts").cast("timestamp"))
    def check(pred: org.apache.spark.sql.Column): Unit = {
      val base = df.filter(pred).select("us").collect().map(_.getLong(0)).toSet
      val rewritten = withRule {
        df.filter(pred).select("us").collect().map(_.getLong(0)).toSet
      }
      assert(rewritten === base, s"pred: $pred")
    }
    for (v <- Seq(-2L, -1L, 0L, 1L, 2L)) {
      check(t >= v); check(t > v); check(t < v); check(t <= v); check(t === v)
      check(lit(v) >= t); check(lit(v) > t); check(lit(v) < t); check(lit(v) <= t)
    }
  }

  test("ntz rewrite fires: the optimized plan compares on ts, not unix_millis") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val pred = graft.model.TimeCols.millis(ev, "ts") >= SINCE
    val plan = withRule {
      ev.filter(pred).queryExecution.executedPlan.toString
    }
    assert(plan.contains("GreaterThanOrEqual(ts,"), plan)
    assert(!plan.contains("unix_millis"), plan)
  }
}
