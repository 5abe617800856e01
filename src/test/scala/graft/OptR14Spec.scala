package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round-14 optimization invariants: every restructured computation must
  * be output-identical to the form it replaces.
  */
class OptR14Spec extends AnyFunSuite with SparkTestBase {

  test("window-sort exact median == percentile(0.5) on even/odd/duplicate groups") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random values: group sizes 1..17 cover odd,
    // even and singleton; values include exact duplicates and negatives
    val rows = for {
      g <- 0 until 23
      i <- 0 until (1 + (g * 7) % 17)
    } yield {
      val h = ((g * 2654435761L + i * 40503L) % 1000003L).toDouble
      (s"g$g", (if ((i + g) % 4 == 0) (h % 97) else h / 7.0) *
        (if ((i * g) % 3 == 1) -1 else 1))
    }
    val df = rows.toDF("k", "v").repartition(7)
    val viaPercentile = df.groupBy("k")
      .agg(expr("percentile(v, 0.5d)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byK = org.apache.spark.sql.expressions.Window.partitionBy("k")
    val viaWindow = df
      .withColumn("rn", row_number().over(byK.orderBy("v")))
      .withColumn("n", count(lit(1)).over(byK))
      .filter(expr("rn = (n + 1) div 2 or rn = n div 2 + 1"))
      .groupBy("k")
      .agg(sum(col("v") * when(col("n") % 2 === 1, 1.0).otherwise(0.5)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaWindow.keySet === viaPercentile.keySet)
    for ((k, m) <- viaPercentile)
      // EXACT doubles, no tolerance: the rewrite must reproduce
      // Percentile's interpolation arithmetic bit-for-bit
      assert(java.lang.Double.doubleToLongBits(viaWindow(k)) ===
        java.lang.Double.doubleToLongBits(m), s"group $k")
  }

  test("union-find fast path: self-pairs register their node; null ids fall back") {
    val s = spark
    import s.implicits._
    // a self-pair on an otherwise isolated node must yield a component row
    val pairs = Seq((1L, 2L), (7L, 7L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L))
    // null endpoints must not crash the fast path (they route to the
    // iterative path, whose join/groupBy semantics tolerate them)
    val withNull = Seq((java.lang.Long.valueOf(4L), java.lang.Long.valueOf(5L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(6L)))
      .toDF("id_a", "id_b")
    val got2 = Dedup.connectedComponents(withNull).collect()
    assert(got2.exists(r => !r.isNullAt(0) && r.getLong(0) == 4L))
  }
}
