package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over basket data (Agrawal & Srikant: "Fast
  * algorithms for mining association rules", VLDB'94 — the Apriori
  * family). The reference has no itemset surface; this is a pipeline
  * extension: co-occurrence mining is how corpus curators find boilerplate
  * templates and product analytics finds bundles.
  *
  * Scale design: support is ANTI-MONOTONE — a triple with support >= s has
  * all three item pairs at support >= s — so every candidate level prunes
  * through the frequent level below it before the expensive join. The
  * frequent-item and frequent-pair sets are aggregates of the basket
  * table (tiny relative to it: bounded by item-vocabulary size, not
  * corpus size), so they BROADCAST, and the pruning is a map-side
  * semi-join on each basket row before any basket-to-basket fan-out. The
  * within-basket triple enumeration then fans out only over baskets whose
  * items survived level-2 pruning. Monotonicity makes the prune lossless:
  * the output equals the naive 3-way self-join the oracle runs.
  */
object Itemsets {

  /** All item triples with basket support >= minSup, from a basket table
    * of (basket, item) rows (pre-distinct not required). Output:
    * (item_a < item_b < item_c, support).
    */
  def frequentTriples(baskets: DataFrame, basketCol: String, itemCol: String,
                      minSup: Long): DataFrame = {
    val t = baskets.select(col(basketCol).as("bk"), col(itemCol).as("it")).distinct()
    // L1: frequent items — broadcast prune of the basket table itself
    val items = t.groupBy("it").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minSup).select("it")
    // materialized ONCE (r14): t1 feeds both self-join sides AND the L3
    // extension join's probe side — exchange reuse covers the self-join
    // but the L3 reference replayed the distinct + prune lineage
    val t1 = t.join(broadcast(items), "it").select("bk", "it")
      .localCheckpoint()
    // (basket x basket) self-join — the operator's heaviest shuffle, so
    // materialize it ONCE (Spark does not share the subplan between the
    // L2 count and the L3 candidate extension). localCheckpoint, NOT
    // cache() (r14): a CacheManager entry is plan-matched by any later
    // identical lineage — the bench's second run of this gate, or a
    // sibling gate over the same baskets — silently handing it this run's
    // materialized pairs; the checkpoint shares within this plan only.
    val bkPairs = t1.as("a").join(t1.as("b"),
        col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
      .select(col("a.bk").as("xbk"), col("a.it").as("x"), col("b.it").as("y"))
      .localCheckpoint()
    // L2: frequent pairs from the L1-pruned table
    val pairs = bkPairs
      .groupBy("x", "y")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minSup)
      .select("x", "y")
    val fp = broadcast(pairs)
    // L3 candidates: extend each frequent (x, y) within its baskets by a
    // third item z > y, keeping only candidates whose other two edges
    // (x,z) and (y,z) are frequent pairs too — the classic prune applied
    // BEFORE the counting shuffle
    val xy = bkPairs
      .join(fp, Seq("x", "y"), "left_semi")
    xy.join(t1.as("c"), col("xbk") === col("c.bk") && col("y") < col("c.it"))
      .select(col("x"), col("y"), col("c.it").as("z"))
      .join(broadcast(fp.select(col("x").as("px"), col("y").as("pz1"))),
        col("x") === col("px") && col("z") === col("pz1"), "left_semi")
      .join(broadcast(fp.select(col("x").as("py"), col("y").as("pz2"))),
        col("y") === col("py") && col("z") === col("pz2"), "left_semi")
      .groupBy(col("x").as("item_a"), col("y").as("item_b"), col("z").as("item_c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSup)
  }
}
