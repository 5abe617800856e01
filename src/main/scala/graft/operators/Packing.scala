package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly operators: token-budget sequence packing and
  * deterministic dataset splits — the last-mile ops between a curated
  * corpus and a training run. Neither exists in the reference (no
  * documents there); both are pinned to arithmetic both engines compute
  * identically, so they gate against DuckDB like every other operator.
  */
object Packing {

  /** Contiguous token binning: documents are laid out in `orderCol` order
    * and cut into bins of `budgetTokens` by the running token count —
    * bin = floor(tokens_before / budget), i.e. packing WITH document
    * straddle (a document crossing a boundary opens the next bin), the
    * semantics of pack-and-split sequence assembly. True no-straddle
    * first-fit is a non-associative scan — not expressible as a window,
    * and not what packed pretraining pipelines do anyway (they split).
    *
    * Scale: a global ordered window funnels through one reducer — this
    * form is [[contiguousPackBucketed]]'s parity oracle (PackingSpec /
    * RewriteParitySpec); the gates ship the bucketed plan.
    */
  def contiguousPack(docs: DataFrame, budgetTokens: Long,
                     tokensCol: Column, orderCol: String = "doc_id",
                     partitionCols: Seq[String] = Nil): DataFrame = {
    val w0 = if (partitionCols.isEmpty) Window.orderBy(orderCol)
             else Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCol)
    val w = w0.rowsBetween(Window.unboundedPreceding, -1)
    docs.select(partitionCols.map(col) ++ Seq(col(orderCol), tokensCol.as("n_tokens")): _*)
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", (col("tokens_before") / budgetTokens).cast("long"))
      .drop("tokens_before")
  }

  /** [[contiguousPack]] without the global single-task sort — the
    * split-merge prefix-sum plan (the `sessionsBucketed` carry recipe,
    * third application). Bit-identical output (RewriteParitySpec pins it
    * at two SFs): the running token count decomposes into a per-bucket
    * local prefix plus the bucket's global offset.
    *
    *  1. rows bucket by `orderCol div bucketSize` — integer-division
    *     bucketing is monotone, so bucket order IS `orderCol` order and
    *     local-prefix + offset reproduces the global running sum exactly
    *     (long arithmetic, no float drift);
    *  2. per-bucket token sums aggregate map-side into a tiny axis
    *     (`rows / bucketSize` entries);
    *  3. a prefix sum over that AGGREGATED axis yields each bucket's
    *     offset — the only partition-less window in the plan sorts the
    *     bucket axis, never raw rows (PlanShapeSpec trips on any
    *     partition-less WindowExec over non-aggregated input);
    *  4. offsets broadcast back (16 bytes per bucket — size `bucketSize`
    *     so the axis stays ~1e5-1e6 entries at the target corpus); the
    *     per-row running sum windows within (partitionCols, bucket), so
    *     no task ever sorts more than one bucket.
    */
  def contiguousPackBucketed(docs: DataFrame, budgetTokens: Long,
                             tokensCol: Column, orderCol: String = "doc_id",
                             partitionCols: Seq[String] = Nil,
                             bucketSize: Long = 65536L): DataFrame = {
    val pcols = partitionCols.map(col)
    val base = docs.select(pcols ++ Seq(col(orderCol), tokensCol.as("n_tokens")): _*)
      .withColumn("__bk", expr(s"`$orderCol` div ${bucketSize}L"))
    val wPre0 = if (partitionCols.isEmpty) Window.orderBy(col("__bk").asc)
                else Window.partitionBy(pcols: _*).orderBy(col("__bk").asc)
    val offKey = partitionCols :+ "__bk"
    val offsets = base.groupBy(offKey.map(col): _*).agg(sum("n_tokens").as("__bs"))
      .withColumn("__off", coalesce(sum("__bs").over(
        wPre0.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(offKey.map(col) :+ col("__off"): _*)
    val wLoc = Window.partitionBy(pcols :+ col("__bk"): _*)
      .orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), offKey)
      .withColumn("tokens_before",
        col("__off") + coalesce(sum(col("n_tokens")).over(wLoc), lit(0L)))
      .withColumn("bin", (col("tokens_before") / budgetTokens).cast("long"))
      .select(pcols ++ Seq(col(orderCol), col("n_tokens"), col("bin")): _*)
  }

  /** No-straddle next-fit packing: documents are laid out per shard in id
    * order and greedily packed — a bin closes when the next document would
    * overflow `budgetTokens`; a document never splits across bins, and an
    * oversized document occupies a bin alone. This is the non-associative
    * scan [[contiguousPack]]'s doc calls out: no window function expresses
    * it, so it runs as imperative per-partition logic via `mapPartitions` —
    * the one operator class where that is the right Spark tool.
    *
    * Scale: one shuffle keyed on the shard column; each shard's scan is
    * sequential (inherent to the semantics — bin N+1 depends on where bin
    * N ended) but shards pack in parallel, so throughput scales with the
    * shard count, the same contract as [[contiguousPack]]'s partitioned
    * mode. Shards are hash-distributed; a partition holding several shards
    * resets its state at each shard boundary (rows arrive sorted by
    * (shard, id) within the partition).
    */
  def nextFitPack(docs: DataFrame, budgetTokens: Long, tokensCol: Column,
                  shardCol: Column, idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(shardCol.cast("string").as("shard"),
      col(idCol).cast("long").as("doc_id"), tokensCol.cast("long").as("n_tokens"))
    val s = base.sparkSession
    import s.implicits._
    base.as[(String, Long, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .mapPartitions { it =>
        var shard: String = null
        var bin = 0L
        var acc = 0L
        it.map { case (sh, id, n) =>
          if (sh != shard) { shard = sh; bin = 0L; acc = 0L }
          if (acc > 0 && acc + n > budgetTokens) { bin += 1; acc = 0L }
          acc += n
          (sh, id, n, bin)
        }
      }
      .toDF("shard", "doc_id", "n_tokens", "bin")
  }

  /** First-`quota` rows of each group in (bucket, id) order — the
    * selection primitive behind deterministic mixture sampling
    * (`sample_balance` / `sample_temperature`) — WITHOUT ranking the
    * group's full row set through one window task.
    *
    * The naive form, `row_number() OVER (PARTITION BY group ORDER BY
    * bucket, id) <= quota`, funnels every row of a group through ONE
    * sort task: with a handful of sources at 100 TB that is a
    * single-reducer full sort to keep a few hundred rows. Instead
    * (the events_decile boundary-then-assign recipe):
    *
    *  1. aggregate per-(group, bucket) counts — the bucket axis is
    *     bounded (<= 1000 per group), so this collapses map-side;
    *  2. a cumulative sum over that tiny axis finds each group's
    *     threshold bucket: buckets wholly below the quota are kept
    *     IN FULL, decided map-side via a broadcast join back — no
    *     per-row shuffle;
    *  3. only the single boundary bucket per group (~1/1000th of the
    *     group) is ranked row-wise, partitioned by (group, bucket) so
    *     even that sort never concentrates a group in one task.
    *
    * Output is bit-identical to the window form (RewriteParitySpec
    * pins it at two SFs): within a bucket, (bucket, id) order IS id
    * order, so keeping whole buckets below the threshold plus the
    * first `quota - cum` ids of the boundary bucket reproduces the
    * global rank cut exactly.
    *
    * `rows` must carry `groupCol`, `bucketCol`, `idCol` (ids unique per
    * group); `quotas` is one row per group: (`groupCol`, quota: long).
    */
  def takeQuotaByGroup(rows: DataFrame, quotas: DataFrame,
                       groupCol: String = "source", bucketCol: String = "bucket",
                       idCol: String = "doc_id"): DataFrame = {
    val wcum = Window.partitionBy(groupCol).orderBy(col(bucketCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // (group, bucket) histogram + threshold decisions: <= 1000 rows per
    // group, so the window below sorts a bounded axis and the result
    // broadcasts back to the corpus scan
    val decisions = rows.groupBy(groupCol, bucketCol).agg(count(lit(1)).as("__c"))
      .join(quotas, Seq(groupCol))
      .withColumn("__cum0", coalesce(sum("__c").over(wcum), lit(0L)))
      .filter(col("__cum0") < col("quota")) // buckets at/past the quota drop entirely
      .select(col(groupCol).as("__g"), col(bucketCol).as("__b"),
        (col("__cum0") + col("__c") <= col("quota")).as("__all"),
        (col("quota") - col("__cum0")).as("__k"))
    val tagged = rows.join(broadcast(decisions),
      col(groupCol) === col("__g") && col(bucketCol) === col("__b"))
    val whole = tagged.filter(col("__all"))
    val boundary = tagged.filter(!col("__all"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(groupCol, bucketCol).orderBy(col(idCol).asc)))
      .filter(col("__rn") <= col("__k"))
      .drop("__rn")
    whole.unionByName(boundary).select(rows.columns.map(col): _*)
  }

  /** Deterministic train/val/test assignment by Knuth multiplicative
    * hashing on the id — pure 64-bit arithmetic (`(id * 2654435761) mod
    * 2^32 mod 100`), so the split is stable across engines, runs, and
    * partitionings (a requirement: a document must NEVER migrate between
    * splits when the corpus is re-processed). `pctTrain`/`pctVal` are
    * cut points on the 0-99 bucket.
    */
  def splitAssign(docs: DataFrame, idCol: String = "doc_id",
                  pctTrain: Int = 80, pctVal: Int = 10): DataFrame = {
    val bucket = pmod(pmod(col(idCol) * lit(2654435761L), lit(4294967296L)), lit(100L))
    docs.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(col("split_bucket") < pctTrain, "train")
          .when(col("split_bucket") < pctTrain + pctVal, "val")
          .otherwise("test"))
  }
}
