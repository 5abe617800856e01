package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

class CosineSimSpec extends AnyFunSuite with SparkTestBase {

  test("codegen'd cosine_sim is bit-identical to the composable form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        VectorFunctions.asDouble(col("a")).as("a"),
        VectorFunctions.asDouble(col("b")).as("b"))
    val both = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("fast"),
      VectorFunctions.cosineBuiltin(col("a"), col("b")).as("ref")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval path agrees too (codegen disabled)") {
    val s = spark
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      import s.implicits._
      val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
      val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).head().getDouble(0)
      assert(math.abs(got - 10.0 / 14.0) < 1e-15)
    } finally s.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
