package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PushMillisDivPredicates

class PushdownRuleSpec extends AnyFunSuite with SparkTestBase {

  private val SINCE = 1705708800000L

  test("free-form SQL time predicates on t reach parquet PushedFilters") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PushMillisDivPredicates
    try {
      GraftFunctions.registerViews(spark, "/root/testdata/sf0.001")
      val df = spark.sql(s"SELECT series_id, t, value FROM ts WHERE t >= $SINCE")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(s"GreaterThanOrEqual(ts,${SINCE * 1000000L})"), plan)
      // and the rewrite preserves results exactly
      val expected = Tables.events(spark, "/root/testdata/sf0.001")
        .filter(expr("ts div 1000000") >= SINCE).count()
      assert(df.count() === expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PushMillisDivPredicates)
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
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushMillisDivPredicates
      val rewritten =
        try df.filter(pred).select("ts_ns").collect().map(_.getLong(0)).toSet
        finally spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ == PushMillisDivPredicates)
      assert(rewritten === base, s"pred: $pred")
    }
    for (v <- Seq(1L, 2L)) {
      check(t >= v); check(t > v); check(t < v); check(t <= v); check(t === v)
      check(lit(v) >= t); check(lit(v) > t); check(lit(v) < t); check(lit(v) <= t)
    }
    check(t >= 0L) // v < 1: rule must leave it alone (still correct answer)
  }
}
