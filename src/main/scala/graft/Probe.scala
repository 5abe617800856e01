package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Scratch profiling main (dev only). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, d)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    time("warm-count")(docs.count())
    time("scan-text")(docs.select("doc_id", "text").queryExecution.toRdd.count())
    val toks = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    time("explode")(toks.queryExecution.toRdd.count())
    val toksBare = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    time("explode-bare")(toksBare.queryExecution.toRdd.count())
    val toksPre = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("n_tokens"),
        explode(col("arr")).as("tok"))
    time("explode-prearr")(toksPre.queryExecution.toRdd.count())
    val tf = toks.groupBy("doc_id", "tok", "n_tokens").agg(count(lit(1)).as("c"))
    time("tf")(tf.queryExecution.toRdd.count())
    time("tf2")(tf.queryExecution.toRdd.count())
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    time("df")(df.queryExecution.toRdd.count())
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val score = round((col("c") / col("n_tokens")) * log(col("n_docs") / col("df")), 6)
    val joined = tf.join(broadcast(df), "tok").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("tok"), score.as("tfidf"))
    time("joined")(joined.queryExecution.toRdd.count())
    val top = joined.groupBy("doc_id")
      .agg(min_by(struct(col("tok"), col("tfidf")),
        struct(negate(col("tfidf")), col("tok"))).as("top"))
    time("top")(top.queryExecution.toRdd.count())
    time("full-again")(top.queryExecution.toRdd.count())
    spark.stop()
  }
}
