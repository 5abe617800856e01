package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-5 gates, beyond the oracle hash:
  * properties that must hold on ANY input, not just the fixture.
  */
class Round5OpsSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.01"

  test("events_interval_join: every purchase lands in exactly one session") {
    val ev = Tables.events(spark, d)
    val totalPurchases = ev.filter(col("event_type") === "purchase").count()
    val joined = SparkEntry.queries("events_interval_join")(spark, d)
    assert(joined.agg(sum("n_purchases")).head().getLong(0) === totalPurchases)
    // windows are disjoint, so (user, session) rows are unique
    assert(joined.select("user_id", "session_id").distinct().count() === joined.count())
  }

  test("ts_seasonal: decomposition is consistent and bounded") {
    val out = SparkEntry.queries("ts_seasonal")(spark, d).cache()
    // one row per (series, hourly bucket) of the raw grid
    val buckets = graft.model.TsModel.ts(spark, d)
      .select(col("series_id"), expr("t div 3600000").as("bucket")).distinct().count()
    assert(out.count() === buckets)
    // the emitted columns recompose: v - trend - seasonal == residual
    // within the 1e-4 output rounding on each term
    val bad = out.filter(
      abs(col("v") - col("trend") - col("seasonal") - col("residual")) > 4e-4).count()
    assert(bad === 0)
    // seasonal is an hour-of-day profile: <= 24 distinct values per series
    val prof = out.groupBy("series_id")
      .agg(countDistinct("seasonal").as("nsea")).collect()
    assert(prof.nonEmpty && prof.forall(_.getLong(1) <= 24))
    out.unpersist()
  }

  test("mm_pixels: every document decodes, statistics stay in pixel range") {
    val out = SparkEntry.queries("mm_pixels")(spark, d).cache()
    assert(out.count() === Tables.documents(spark, d).count())
    assert(out.filter(col("format") =!= "png").count() === 0)
    for (c <- Seq("mean_r", "mean_g", "mean_b", "mean_lum"))
      assert(out.filter(col(c) < 0 || col(c) > 255).count() === 0, c)
    assert(out.filter(col("width") < 16 || col("width") > 32 ||
      col("height") < 16 || col("height") > 24).count() === 0)
    out.unpersist()
  }

  test("mm_audio: square-wave identity rms == mean_abs == peak, all docs decode") {
    val out = SparkEntry.queries("mm_audio")(spark, d).cache()
    assert(out.count() === Tables.documents(spark, d).count())
    assert(out.filter(col("rms") =!= col("mean_abs") ||
      col("rms") =!= col("peak").cast("double")).count() === 0)
    out.unpersist()
  }

  test("ts_seasonal's integer half-up rounding matches BigDecimal HALF_UP on negatives") {
    val s = spark
    import s.implicits._
    // the gate's r4i formula, extracted: a*100/b at 4dp, half-up away from 0
    val rows = Seq((-15L, 10L), (15L, 10L), (-1L, 3L), (1L, 3L), (-25L, 1000L),
      (0L, 7L), (-999L, 13L), (999L, 13L)).toDF("a", "b")
      .selectExpr("a", "b",
        "CAST(CASE WHEN a >= 0 THEN (200 * a + b) div (2 * b)" +
        " ELSE -((-200 * a + b) div (2 * b)) END AS DOUBLE) / 10000.0D AS r")
      .collect()
    for (r <- rows) {
      val (a, b) = (r.getLong(0), r.getLong(1))
      val expect = BigDecimal(a * 100) / BigDecimal(b * 10000)
      val rounded = expect.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) === rounded, s"a=$a b=$b")
    }
  }

  test("IVF over an empty corpus degrades to empty results, not a crash") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.fitCenters(empty, 4).isEmpty)
    val (celled, centers) = graft.operators.Similarity.fitCells(empty, 4)
    assert(celled.count() === 0 && centers.count() === 0)
    assert(celled.columns.toSeq === Seq("vec_id", "v", "cell"))
    assert(graft.operators.Similarity
      .assignCellsRounded(empty, Array.empty, dp = 4).count() === 0)
  }

  test("sample_temperature: quotas follow c^0.5 shares, rare sources upweighted") {
    val docs = Tables.documents(spark, d)
    val out = SparkEntry.queries("sample_temperature")(spark, d).cache()
    val selected = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // fold in sorted-source order, matching the gate's pinned summation
    val denom = counts.toSeq.sortBy(_._1).map(kv => math.sqrt(kv._2.toDouble))
      .foldLeft(0.0)(_ + _)
    for ((src, c) <- counts) {
      val quota = math.floor(math.sqrt(c) / denom * 300 + 0.5).toLong
      assert(selected.getOrElse(src, 0L) === math.min(quota, c), src)
      // temperature flattens: every source's selected share exceeds half
      // its quota share only through the sqrt upweighting of rare sources
      val rawShare = c.toDouble / counts.values.sum
      val tShare = math.sqrt(c) / denom
      if (rawShare < 1.0 / counts.size) assert(tShare > rawShare, src)
    }
    out.unpersist()
  }

  test("agg_approx_distinct: exact counts are the hard answer, sketch within bound") {
    val got = SparkEntry.queries("agg_approx_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    def exact(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.select(countDistinct(col(c))).head().getLong(0)
    assert(got("events.event_type") === ((exact(Tables.events(spark, d), "event_type"), true)))
    assert(got("nation.n_name") === ((exact(Tables.nation(spark, d), "n_name"), true)))
    assert(got("region.r_name") === ((exact(Tables.region(spark, d), "r_name"), true)))
    assert(got("customer.c_mktsegment") === ((exact(Tables.customer(spark, d), "c_mktsegment"), true)))
    assert(got("orders.o_orderpriority") === ((exact(Tables.orders(spark, d), "o_orderpriority"), true)))
  }
}
