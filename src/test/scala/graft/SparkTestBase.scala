package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for all suites (getOrCreate dedups). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.spark

  /** TS fixture rows: (series_id, t, value, tags, event_id). */
  def tsFrame(rows: Seq[(String, Long, Double, Map[String, String], Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("series_id", "t", "value", "tags", "event_id")
  }
}
