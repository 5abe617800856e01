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
      println(f"[probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 3) {
      val idx = s"/tmp/probe_pqd_$r"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
      val emb = Tables.embeddings(spark, d).filter(col("vec_id") < 500)
      time(s"r$r writePqIndex") {
        Similarity.writePqIndex(emb, idx, m = 8, k = 16)
      }
      time(s"r$r deleteFromPqIndex") {
        Similarity.deleteFromPqIndex(spark, idx,
          emb.filter(col("vec_id") % 7 === 6).select("vec_id"))
      }
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      var masked: DataFrame = null
      time(s"r$r masked search + ckpt") {
        masked = Similarity.pqSearchIndexed(spark, idx, q, k = 5).localCheckpoint()
      }
      time(s"r$r compactPqIndex") {
        Similarity.compactPqIndex(spark, idx)
      }
      var folded: DataFrame = null
      time(s"r$r folded search + ckpt") {
        folded = Similarity.pqSearchIndexed(spark, idx, q, k = 5).localCheckpoint()
      }
      time(s"r$r guard (exceptAll x2 + anti)") {
        val diff = masked.exceptAll(folded).unionAll(folded.exceptAll(masked))
        folded.join(broadcast(diff.limit(1)), lit(true), "left_anti")
          .queryExecution.toRdd.count()
      }
      // rerank_indexed phases
      val base = s"/tmp/probe_rrk_$r"
      val (coded, raw) = (base + "_pq", base + "_raw")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(coded))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(raw))
      time(s"r$r rrk writePqIndex")   { Similarity.writePqIndex(emb, coded, m = 8, k = 16) }
      time(s"r$r rrk writeIvfIndex")  { Similarity.writeIvfIndex(emb, raw) }
      val doomed = emb.filter(col("vec_id") % 7 === 6).select("vec_id")
      time(s"r$r rrk deleteFromPq")   { Similarity.deleteFromPqIndex(spark, coded, doomed) }
      time(s"r$r rrk deleteFromIvf")  { Similarity.deleteFromIvf(spark, raw, doomed) }
      time(s"r$r rrk rerankIndexed")  {
        Similarity.rerankIndexed(spark, coded, raw, q, nShortlist = 20, k = 5)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
