package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Fit/apply separation for corpus-level text models — the 100 TB working
  * pattern: statistics that need a corpus pass (vocabulary counts, IDF,
  * benchmark gram sets) are FIT once and persisted as small parquet
  * "model" tables; scoring any shard later is a map-only pass with the
  * model broadcast. Re-scoring, incremental ingest and train/eval reuse
  * all read the same fitted model instead of re-scanning the corpus —
  * and two shards scored on different days agree bit-for-bit because the
  * model is frozen.
  *
  * Layout under `path`: `vocab/` (tok, c, df), `meta/` (n_docs,
  * total_tokens). Same shape as [[Similarity.writeIvfIndex]]'s centers.
  */
object CorpusModel {

  /** One corpus pass: unigram counts + document frequencies + totals. */
  def fit(docs: DataFrame, path: String): Unit = {
    val toks = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("arr"))
      .select(col("doc_id"), explode(col("arr")).as("tok"))
    val vocab = toks.groupBy("tok")
      .agg(count(lit(1)).as("c"), countDistinct(col("doc_id")).as("df"))
    vocab.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/vocab")
    docs.agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text"))).as("total_tokens"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/meta")
  }

  /** Map-only scoring of any document frame against a fitted model:
    * per-doc mean unigram log-prob and top-IDF term, with the (small)
    * vocab broadcast — no corpus-wide shuffle except the per-doc
    * aggregate.
    */
  def scoreLogProb(spark: SparkSession, path: String, docs: DataFrame): DataFrame = {
    val vocab = spark.read.parquet(s"$path/vocab")
    val meta = spark.read.parquet(s"$path/meta")
    val toks = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("arr"))
      .select(col("doc_id"), explode(col("arr")).as("tok"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .crossJoin(broadcast(meta))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        // unseen tokens (null c) score as a 1-count (add-one floor), so a
        // frozen model applies to NEW shards without nulling the doc score
        round(avg(log(coalesce(col("c"), lit(1L)) /
          col("total_tokens").cast("double"))), 6).as("avg_logprob"))
  }
}
