package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SetSimilarity, TextFunctions}
import graft.operators.Dedup

/** The live twin of [[graft.operators.Dedup.minhashLshIncremental]]: a
  * STREAM of incoming documents screened for near-duplicates against a
  * STATIC history corpus, emitting `(doc_id, ts, hist_id, jaccard)` as
  * documents arrive — the online admission check of a rolling crawl
  * ingest ("is this page a near-copy of something we already hold?").
  *
  * Plan shape (all built-in Structured Streaming operators):
  *  - the stream side is STATELESS per row: token set -> minhash
  *    signature -> band explode, sharing [[Dedup.bandStructs]] and
  *    [[Dedup.withToks]]'s derivations so the LSH keys are bit-identical
  *    to the batch screen;
  *  - candidates come from a stream-static equi-join on `(band, bh)`
  *    against the history band table (at scale: precomputed once and
  *    appended per ingest, exactly the batch operator's asset);
  *  - verification is the exact-jaccard expression inline in the join
  *    projection — no second pass;
  *  - a doc colliding with the same history doc in several bands emits
  *    duplicate witnesses: `dropDuplicatesWithinWatermark(doc_id,
  *    hist_id)` collapses them with state bounded by the event-time
  *    watermark horizon, not the stream length.
  *
  * State is therefore O(verified pairs within the watermark window); the
  * static side is the only unbounded asset and it lives in the lake, not
  * the state store. StreamingNearDupSpec pins batch parity: the streamed
  * result equals [[Dedup.minhashLshIncremental]] over the same documents.
  *
  * `docs` must carry `doc_id, text, ts` with `ts` an event-time
  * timestamp; `historyDocs` carries `doc_id, text`.
  */
object StreamingNearDup {

  def screen(docs: DataFrame, historyDocs: DataFrame, tau: Double,
             numHashes: Int = 64, bands: Int = 16,
             delay: String = "10 minutes"): DataFrame = {
    val toks = array_sort(TextFunctions.distinctTokens(col("text")))
    val stream = docs
      .select(col("doc_id"), col("ts"), toks.as("toks"))
      .withColumn("sig", Dedup.minhashSignature(col("toks"), numHashes))
      .select(col("doc_id"), col("ts"), col("toks"),
        explode(Dedup.bandStructs(col("sig"), numHashes, bands)).as("bb"))
      .select(col("doc_id"), col("ts"), col("toks"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))
      .withWatermark("ts", delay)
    val hist = Dedup.minhashBands(historyDocs, numHashes, bands)
      .withColumnRenamed("doc_id", "hist_id")
      .join(Dedup.withToks(historyDocs)
        .select(col("doc_id").as("hist_id"), col("toks").as("htoks")), "hist_id")
    stream.join(hist, Seq("band", "bh"))
      .withColumn("jac", SetSimilarity.jaccard_sorted(col("toks"), col("htoks")))
      .filter(col("jac") >= tau)
      .select(col("doc_id"), col("ts"), col("hist_id"),
        round(col("jac"), 6).as("jaccard"))
      .dropDuplicatesWithinWatermark("doc_id", "hist_id")
  }
}
