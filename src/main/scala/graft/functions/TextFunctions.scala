package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline, all column
  * expressions (codegen'd, no UDFs). Each has an ANSI-SQL twin used in the
  * DuckDB oracles — see SparkEntry.oracleSql.
  */
object TextFunctions {

  /** Whitespace tokenization of lowercased, trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Occurrence count of tokens drawn from a fixed word list. */
  def tokenHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words))).cast("long")

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  /** Stopword ratio — a standard cheap quality signal. */
  def stopwordRatio(text: Column): Column =
    round(tokenHits(text, stopwords).cast("double") / tokenCount(text), 4)

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column =
    round(aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t).cast("long"))
            .cast("double") / tokenCount(text), 4)

  /** Ratio of non-alphanumeric, non-space characters (punctuation/noise). */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
            greatest(length(text), lit(1)), 4)

  /** N-gram-free language ID: marker-stopword voting over en/es/de with a
    * deterministic tie-break (en > es > de, no markers -> "und"). The same
    * CASE expression runs in the oracle.
    */
  val enMarkers: Seq[String] = Seq("the", "a", "of", "and", "to", "is")
  val esMarkers: Seq[String] = Seq("el", "la", "los", "de", "que", "y")
  val deMarkers: Seq[String] = Seq("der", "die", "und", "das", "ist", "ein")

  def langId(text: Column): Column = {
    val en = tokenHits(text, enMarkers)
    val es = tokenHits(text, esMarkers)
    val de = tokenHits(text, deMarkers)
    when(en === 0 && es === 0 && de === 0, lit("und"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Canonical text form: lowercased, trimmed, whitespace collapsed — the
    * normalization under [[fingerprint]], exposed so identity keys can add
    * components (length) over the SAME form the hash saw.
    */
  def canonical(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Canonical-form fingerprint: md5 over lowercased text with collapsed
    * whitespace. Exact-dup detection robust to spacing; identical SQL twin.
    */
  def fingerprint(text: Column): Column =
    md5(canonical(text))

  /** Word n-gram shingles (for MinHash): n consecutive tokens joined by a
    * separator, built with a transform over token offsets — stays columnar.
    */
  def shingles(text: Column, n: Int): Column =
    array_distinct(allShingles(text, n))

  /** Every n-token shingle occurrence, duplicates kept — the input for
    * repetition statistics, where multiplicity IS the signal.
    *
    * Built as `arrays_zip` over `n` shifted slices of the token array, NOT
    * as a transform over offsets indexing into the tokens: an expression
    * referenced inside a lambda body is re-evaluated per element, so the
    * offset form re-ran the regex tokenizer once per shingle (~n_tokens
    * times per row — measured 6x on the contamination gate). Zip arguments
    * evaluate once per row. Requires >= n tokens (callers filter first;
    * shorter rows yield an empty array).
    */
  def allShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    if (n == 1) toks
    else {
      val len = greatest(size(toks) - (n - 1), lit(0))
      val parts = (1 to n).map(i => slice(toks, lit(i), len))
      transform(arrays_zip(parts: _*),
        s => concat_ws(" ", (0 until n).map(i => s.getField(i.toString)): _*))
    }
  }
}
