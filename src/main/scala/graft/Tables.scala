package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench) —
  * and, unchanged, against a 100 TB lake: the reads are plain parquet scans
  * and every downstream filter/projection is declarative, so Catalyst pushes
  * predicates and prunes columns into the scan at any scale.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Give a CPU-heavy pipeline scan-side parallelism when the file layout
    * cannot (r13 optimization, guide §2.5 "input skew — repartition
    * immediately after the read"): a small table is one parquet file with
    * one row group, which no `maxPartitionBytes` setting can split, so
    * every narrow pipeline over it — tokenization, codec decode, vector
    * math — runs on ONE core until its first exchange. When the scan
    * yields fewer partitions than the session's parallelism, hash-spread
    * it by the table's key (deterministic placement, no sort); at lake
    * scale the scan already has >= cores partitions and this is a no-op,
    * so the extra exchange exists only where it buys parallelism.
    * Filters/pruning still reach the scan — Catalyst pushes predicates
    * and column pruning through RepartitionByExpression.
    */
  // The scan-partition probe (`df.rdd.getNumPartitions`) compiles a
  // physical plan and lists files — 0.1-0.3 s per call, paid by EVERY
  // query over the table. A table path's split count is fixed for a
  // session (same files, same maxPartitionBytes), so probe once per
  // (application, path) and memoize the decision.
  // ASSUMES IMMUTABLE INPUT TABLES (r14, ADVICE): the memo never expires,
  // so a path overwritten or appended mid-application keeps its stale
  // spread decision (stale only in degree of parallelism — never
  // correctness: the repartition preserves the row multiset, and no
  // consumer of these source tables is scan-order-sensitive). The bench
  // source tables are static; a mutable-table session would key the memo
  // on a file-listing fingerprint instead.
  private val spreadMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Boolean]()

  private def spread(df: DataFrame, key: org.apache.spark.sql.Column,
                     path: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val need = spreadMemo.computeIfAbsent(
      (df.sparkSession.sparkContext.applicationId, path),
      _ => df.rdd.getNumPartitions < p)
    if (need) df.repartition(p, key) else df
  }

  import org.apache.spark.sql.functions.col
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  =
    spread(table(s, d, "documents"), col("doc_id"), s"$d/documents.parquet")
  /** The UNSPREAD documents scan, for gates where the spread exchange is
    * a measured net cost (r14, VERDICT item 8): the `sample` family's
    * quota/shuffle gates feed small global windows or source-axis
    * aggregates — an extra |corpus| exchange in front buys them nothing.
    * Measured at sf0.1/32c with an in-run control: epoch_shuffle
    * 6.5->1.1 s, temperature 2.9->0.7, quantile_norm 1.9->0.5,
    * balance 1.4->0.6 with spread OFF, while dedup_minhash NEEDS the
    * spread (1.0->2.4 without). Same rows either way — the choice is
    * parallelism shape only.
    */
  def documentsPlain(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(table(s, d, "embeddings"), col("vec_id"), s"$d/embeddings.parquet")
}
