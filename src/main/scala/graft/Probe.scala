package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch profiling main (dev only). */
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
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val embS = Tables.embeddings(spark, d)  // spread
    val embP = Tables.table(spark, d, "embeddings") // plain
    embS.count(); embP.count()
    for (r <- 1 to 3) {
      time(s"tables-embeddings-$r")(Tables.embeddings(spark, d))
      val idx = s"/tmp/probe_gate_ivfidx"
      time(s"gate-construct-$r") {
        val e = Tables.embeddings(spark, d)
        Similarity.writeIvfIndex(e, idx)
      }
      time(s"gate-search-$r") {
        val q = Tables.embeddings(spark, d).filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        Similarity.ivfTopKIndexed(spark, idx, q, k = 5)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
