package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TsModel
import graft.sources.TsStorage

class StorageAndSqlSpec extends AnyFunSuite with SparkTestBase {

  private lazy val tmpRoot = {
    val p = new java.io.File("target/tmp-storage")
    p.mkdirs()
    p.getAbsolutePath
  }

  test("partitioned layout round-trips and prunes partitions (SURVEY §4 row 1)") {
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_part"
    TsStorage.write(ts, path)
    val back = TsStorage.read(spark, path)
    assert(back.count() === ts.count())
    // series filter must prune at PARTITION level, not row level
    val plan = back.filter(org.apache.spark.sql.functions.col("series_id") === "purchase")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("(series_id") && plan.contains("purchase"),
      s"no partition filter in:\n$plan")
    // values survive the round trip
    val a = ts.select("event_id", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = back.select("event_id", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a === b)
  }

  test("append lands new rows; compact preserves content (S1/S2)") {
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_append"
    TsStorage.write(ts, path)
    TsStorage.append(ts.limit(50), path)
    assert(TsStorage.read(spark, path).count() === ts.count() + 50)
    TsStorage.compact(spark, path)
    assert(TsStorage.read(spark, path).count() === ts.count() + 50)
  }

  test("custom expressions usable from spark.sql after register()") {
    GraftFunctions.register(spark)
    GraftFunctions.registerViews(spark, "/root/testdata/sf0.001")
    val sim = spark.sql(
      "SELECT cosine_sim(CAST(array(1.0,2.0) AS array<double>), CAST(array(2.0,4.0) AS array<double>)) AS s")
      .head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
    val sh = spark.sql("SELECT simhash64(array('a','b')) AS h").head().getLong(0)
    assert(sh === spark.sql("SELECT simhash64(array('a','b')) AS h").head().getLong(0))
    val top = spark.sql(
      """SELECT series_id, inline(topk_rows(struct(t, event_id, value), 2, true))
        |FROM ts GROUP BY series_id""".stripMargin)
    assert(top.count() === 10) // 5 series x 2
    // free-form SQL over the TS view
    val agg = spark.sql("SELECT max(value) FROM ts WHERE series_id = 'purchase'")
    assert(agg.head().getDouble(0) > 0)
  }

  test("GraftExtensions wires the same functions for new sessions") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // builds without error; injection is
    // exercised for real through the registry path above (same builders)
  }
}
