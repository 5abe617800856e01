package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level text analysis for the training-data pipeline: benchmark
  * contamination and unigram language-model scoring. Both follow the same
  * scale shape — the *model* side (benchmark n-gram set, vocabulary) is
  * orders of magnitude smaller than the corpus, so it rides broadcast and
  * the corpus is scored in a single pass with no corpus-wide shuffle on
  * the scoring path.
  */
object CorpusAnalysis {

  /** Distinct word-`n`-gram hashes per document, pre-materialized in their
    * own projection (a sibling `size(split(..))` next to an explode would
    * re-run the tokenizer per output row — measured ~25x).
    */
  private def withGramHashes(docs: DataFrame, n: Int): DataFrame =
    docs
      .filter(size(TextFunctions.tokens(col("text"))) >= n)
      .select(col("doc_id"),
        array_distinct(transform(TextFunctions.allShingles(col("text"), n),
          g => xxhash64(g))).as("grams"))

  /** Benchmark contamination: for each non-benchmark document, the fraction
    * of its distinct `n`-gram hashes that also occur in any benchmark
    * document — the standard decontamination check run before training so
    * eval sets don't leak into the corpus.
    *
    * The benchmark gram set (small: eval suites are thousands of documents,
    * not billions) is broadcast; the corpus explodes its distinct grams once
    * and aggregates back by doc — one shuffle keyed on doc_id, never a
    * corpus×corpus join.
    */
  def ngramContamination(docs: DataFrame, isBenchmark: Column, n: Int): DataFrame = {
    // explode_outer, not explode: InferFiltersFromGenerate otherwise adds
    // a size(grams)>0 filter that inlines (and re-evaluates) the whole
    // gram-construction expression per row; the >= n-token filter already
    // guarantees non-empty arrays, so the outer variant is output-identical
    val g = withGramHashes(docs, n)
    val bench = g.filter(isBenchmark)
      .select(explode_outer(col("grams")).as("g")).distinct()
    val eval = g.filter(!isBenchmark)
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode_outer(col("grams")).as("g"))
    eval.join(broadcast(bench.withColumn("hit", lit(1L))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(max("n_grams").as("n_grams"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6).as("contamination"))
  }

  /** Sliding-window document chunking: split each document's token stream
    * into windows of `window` tokens advancing by `stride` (overlap =
    * window - stride keeps boundary context), the standard pre-tokenization
    * step that turns variable-length documents into trainable sequences.
    * Chunk count is `ceil(max(len - window, 0) / stride) + 1`, so every
    * token lands in at least one chunk and the tail chunk may run short.
    *
    * Pure per-row fan-out: the token array materializes once per document,
    * the explode emits (doc, chunk) pairs with no shuffle at all — at
    * 100 TB this is a map-only stage.
    */
  def chunkTokens(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    val lastIdx = ceil(greatest(size(col("arr")) - window, lit(0)) / stride.toDouble)
      .cast("long")
    docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("arr"))
      .select(col("doc_id"), col("arr"),
        explode(sequence(lit(0L), lastIdx)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        size(slice(col("arr"), col("chunk_idx") * stride + 1, lit(window)))
          .cast("long").as("n_tokens"),
        element_at(col("arr"), (col("chunk_idx") * stride + 1).cast("int")).as("first_tok"))
  }

  /** Bigram log-probability scoring — the next rung above
    * [[unigramLogProb]] on the KenLM ladder: each document's mean
    * `ln P(w_i | w_{i-1})` with conditional probabilities
    * `c(w_{i-1} w_i) / c_head(w_{i-1})` fit on the corpus itself, where
    * `c_head` counts bigram HEAD occurrences (so the conditionals sum to 1
    * and a document's last token never skews the denominator).
    *
    * Scale shape: the bigram table is the broadcast side (vocabulary², but
    * only OBSERVED pairs); the corpus streams once through the join and
    * aggregates per doc — same single-shuffle contract as the unigram fit.
    */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("arr"), lit(1), size(col("arr")) - 1),
          slice(col("arr"), lit(2), size(col("arr")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bigrams = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val heads = pairs.groupBy(col("w1").as("h")).agg(count(lit(1)).as("c1"))
    pairs
      .join(broadcast(bigrams), Seq("w1", "w2"))
      .join(broadcast(heads), col("w1") === col("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("c2") / col("c1").cast("double"))), 6).as("avg_logprob2"))
  }

  /** Unigram log-probability scoring: fit p(tok) = count/total on the corpus
    * itself, then score each document by the mean natural-log probability of
    * its token occurrences — the classic cheap fluency/quality proxy (a
    * one-table stand-in for a KenLM pass). The vocabulary is the broadcast
    * side; the corpus token stream never shuffles except the per-doc
    * aggregation keyed on doc_id.
    */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("arr"))
      .select(col("doc_id"), explode(col("arr")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum("c").cast("double").as("total"))
    toks.join(broadcast(vocab), "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("c") / col("total"))), 6).as("avg_logprob"))
  }

  /** DSIR-style importance weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS'23): score every
    * document by the mean log-likelihood *ratio* between a target-domain
    * unigram model and the raw-corpus unigram model, both fit with add-one
    * smoothing over the raw vocabulary. High scores = "looks like the
    * target domain"; downstream selection samples proportionally.
    *
    * Scale shape mirrors [[unigramLogProb]]: both models live on the
    * (small) vocabulary axis and broadcast; the corpus token stream is
    * scored in one pass and aggregates once per doc_id. Docs in the target
    * slice are scored too — selection policy, not scoring, decides whether
    * to exclude them.
    */
  def importanceWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs
      .select(col("doc_id"), isTarget.as("is_t"),
        TextFunctions.tokens(col("text")).as("arr"))
      .select(col("doc_id"), col("is_t"), explode(col("arr")).as("tok"))
    val raw = toks.groupBy("tok").agg(count(lit(1)).as("cr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    // totals + vocab size on the driver-free aggregate axis: one tiny row
    val norms = raw.agg(sum("cr").as("nr"), sum("ct").as("nt"),
      count(lit(1)).as("v"))
    val ratio = log((col("ct") + lit(1.0)) / (col("nt") + col("v"))) -
      log((col("cr") + lit(1.0)) / (col("nr") + col("v")))
    toks.join(broadcast(raw), "tok")
      .crossJoin(broadcast(norms))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(ratio), 6).as("dsir_weight"))
  }

  /** Linear text-classifier inference (the fastText / quality-classifier
    * serving shape): a fixed vocabulary of the `vocabSize` most frequent
    * corpus tokens, each carrying an integer weight, scored as the plain
    * bag-of-words dot product. Weights here are a deterministic
    * pseudo-random function of the token's frequency rank (a stand-in for
    * trained coefficients — the *serving plan* is what this operator
    * pins): weight(rank) = ((rank * 2654435761) mod 2001) - 1000.
    *
    * All-integer arithmetic end to end, so the gate hash-compares scores
    * exactly. Scale shape: vocabulary selection is a bounded
    * TakeOrderedAndProject (never a full vocab sort), the weight table
    * broadcasts, and scoring is one map-side join + one per-doc
    * aggregation — the same single-shuffle contract as the LM scorers.
    */
  def linearScore(docs: DataFrame, vocabSize: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("arr"))
      .select(col("doc_id"), explode(col("arr")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc)
      .limit(vocabSize)
    val w = Window.orderBy(col("c").desc, col("tok").asc)
    val weighted = vocab.withColumn("rank", row_number().over(w))
      .select(col("tok"),
        (pmod(col("rank") * lit(2654435761L), lit(2001L)) - lit(1000L))
          .as("wt"))
    val scored = toks.join(broadcast(weighted), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), sum("wt").as("score"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("score"), lit(0L)).as("score"))
      .withColumn("label", col("score") > 0L)
  }

  /** Domain-mixture weights (the Pile / LLaMA data-recipe step): one row
    * per source with its document and token mass, and a temperature-scaled
    * sampling weight `sqrt(n_tokens) / Σ sqrt(n_tokens)` (α = 0.5
    * up-weights small domains; sqrt is IEEE-exact on both engines, unlike
    * a general pow). The whole computation collapses to the source axis in
    * one map-side-combining aggregate; the normalization window runs over
    * that tiny axis only.
    */
  def domainMixture(docs: DataFrame, source: String): DataFrame = {
    val bySrc = docs.groupBy(source)
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"))
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bySrc
      .withColumn("mix_weight",
        round(sqrt(col("n_tokens")) / sum(sqrt(col("n_tokens"))).over(w), 6))
  }
}
