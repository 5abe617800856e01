package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch harness for phase-level measurements (not part of the
  * bench/verify contract; rewritten per investigation).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ts_trend_robust: window-median rewrite vs the median() original,
    // compared UNROUNDED-equivalent at the declared output (rounded 6dp)
    val ts = graft.model.TsModel.ts(spark, d)
    val hourly = ts
      .select(col("series_id"), expr("t div 3600000").as("h"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("series_id", "h").agg(sum("c").as("v"))
    val old = hourly.as("a").join(hourly.as("b"),
        col("a.series_id") === col("b.series_id") && col("a.h") < col("b.h"))
      .select(col("a.series_id").as("series_id"),
        ((col("b.v") - col("a.v")).cast("double") /
          (col("b.h") - col("a.h")).cast("double")).as("slope"))
      .groupBy("series_id")
      .agg(count(lit(1)).as("n_pairs"),
        round(median(col("slope")), 6).as("slope_cents_per_hour"))
    val neu = SparkEntry.queries("ts_trend_robust")(spark, d)
    val diff = old.exceptAll(neu).unionAll(neu.exceptAll(old)).count()
    println(s"[probe] trend old-vs-new diff rows = $diff (old ${old.count()}, new ${neu.count()})")
    spark.stop()
  }
}
