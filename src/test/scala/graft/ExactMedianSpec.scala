package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactMedian

/** Pins the bounded-memory histogram-selection median EXACTLY against
  * Spark's buffering `median()` across odd/even counts, heavy duplicates,
  * sub-resolution ranges, and the testdata.
  */
class ExactMedianSpec extends AnyFunSuite with SparkTestBase {

  private def dfOf(vals: Seq[Double]) = {
    val s = spark
    import s.implicits._
    vals.toDF("value")
  }

  private def sparkMedian(vals: Seq[Double]): Double =
    dfOf(vals).agg(org.apache.spark.sql.functions.median(
      org.apache.spark.sql.functions.col("value"))).head().getDouble(0)

  test("agrees with median() on random data, odd and even counts, duplicates") {
    val rnd = new scala.util.Random(23)
    for (n <- Seq(1, 2, 7, 100, 101, 1000)) {
      val vals = Seq.fill(n)(math.floor(rnd.nextDouble() * 50) / 5.0) // many dups
      assert(ExactMedian.median(dfOf(vals)) === Some(sparkMedian(vals)), s"n=$n")
    }
  }

  test("sub-resolution range resolves exactly (driver fallback path)") {
    val base = 1.0
    val eps = java.lang.Math.ulp(base)
    val vals = Seq(base, base + eps, base + 2 * eps, base + 2 * eps, base + 3 * eps)
    assert(ExactMedian.median(dfOf(vals)) === Some(sparkMedian(vals)))
  }

  test("empty input is None; NaN ignored; infinities ordered") {
    assert(ExactMedian.median(dfOf(Nil)) === None)
    val withNaN = Seq(1.0, Double.NaN, 3.0, Double.NaN)
    assert(ExactMedian.median(dfOf(withNaN)) === Some(2.0))
    assert(ExactMedian.median(dfOf(Seq(1.0, 2.0, Double.PositiveInfinity)))
      === Some(2.0))
    assert(ExactMedian.median(dfOf(Seq(Double.NegativeInfinity, 5.0,
      Double.PositiveInfinity))) === Some(5.0))
    assert(ExactMedian.median(dfOf(Seq(Double.NegativeInfinity, 1.0)))
      === Some(Double.NegativeInfinity))
  }

  test("matches the ts_agg_median gate value on real events") {
    val ts = graft.model.TsModel.ts(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("series_id") === "purchase")
    val exact = ts.agg(org.apache.spark.sql.functions.median(
      org.apache.spark.sql.functions.col("value"))).head().getDouble(0)
    assert(ExactMedian.median(ts) === Some(exact))
  }
}
