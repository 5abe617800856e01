package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 rewrites replaced three gate plans with scale-safe forms (no
  * per-type single-task ntile sort, no collect_list of a user's history,
  * no per-user quadratic band join). These parity tests pin each rewrite
  * to the straightforward formulation it replaced — the rewrites must be
  * pure plan changes, bit-identical in output, at more than one SF.
  */
class RewriteParitySpec extends AnyFunSuite with SparkTestBase {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val cols = a.columns.sorted.map(col(_))
    val l = a.select(cols: _*).collect().map(_.toString).sorted
    val r = b.select(cols: _*).collect().map(_.toString).sorted
    assert(l.length === r.length)
    assert(l.sameElements(r), l.zip(r).find { case (x, y) => x != y })
  }

  test("events_decile boundary-then-assign == ntile over raw rows") {
    for (d <- dirs) {
      val raw = Tables.events(spark, d)
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").asc, col("event_id").asc)
      val direct = raw.select(col("event_type"), col("value"), col("event_id"))
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("event_type", "decile")
        .agg(count(lit(1)).as("n"), round(min("value"), 2).as("lo"),
          round(max("value"), 2).as("hi"))
      assertSameRows(SparkEntry.queries("events_decile")(spark, d), direct)
    }
  }

  test("user_path_topk lead-window trigrams == collect_list trigrams") {
    for (d <- dirs) {
      val raw = Tables.events(spark, d)
      val direct = raw
        .select(col("user_id"), graft.model.TimeCols.millis(raw, "ts").as("t"),
          col("event_id"), col("event_type"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("t"), col("event_id"),
          col("event_type")))).as("s"))
        .select(expr("transform(s, x -> x.event_type)").as("types"))
        .filter(size(col("types")) >= 3)
        .select(explode(expr(
          "transform(sequence(0, size(types) - 3), " +
          "i -> concat_ws('>', types[i], types[i+1], types[i+2]))")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("path").asc)
        .limit(20)
      assertSameRows(SparkEntry.queries("user_path_topk")(spark, d), direct)
    }
  }

  test("events_near_join bucketed band join == direct per-user band join") {
    for (d <- dirs) {
      val raw = Tables.events(spark, d)
      val ev = raw.select(col("user_id"), col("event_id"), col("event_type"),
        graft.model.TimeCols.millis(raw, "ts").as("t"))
      val errs = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("e_uid"), col("event_id").as("err_id"),
          col("t").as("err_t"))
      val clicks = ev.filter(col("event_type") === "click")
      val direct = errs.join(clicks,
          col("e_uid") === col("user_id") &&
          col("t") >= col("err_t") - 60000L && col("t") <= col("err_t") + 60000L,
          "left_outer")
        .groupBy(col("err_id"))
        .agg(count(col("event_id")).as("n_near_clicks"))
      assertSameRows(SparkEntry.queries("events_near_join")(spark, d), direct)
    }
  }
}
