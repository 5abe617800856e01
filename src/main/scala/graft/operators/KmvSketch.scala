package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKRows

/** K-minimum-values (KMV / theta-sketch) distinct-set sketch and its
  * pairwise set-overlap estimator — the mergeable answer to "how much do
  * these populations overlap" when the sets are too large to intersect
  * exactly (audience overlap, cross-source user overlap, label co-occurrence).
  *
  * The reference has no set-analytics surface at all (its only set op is the
  * multi-series UNION ALL, `/root/reference/src/server.re:208-215`); this is
  * part of the mandated pipeline-extension inventory alongside the HLL++ and
  * count-min gates.
  *
  * Determinism contract: the hash is a fixed Knuth-style multiplicative map
  * into [0, 2^31-1) — injective for keys below the prime modulus, so there
  * are no hash ties and both engines can replay the *exact same sketch* in
  * plain integer SQL. That makes the estimate itself hash-gateable (the same
  * trick as the count-min gate) — no tolerance boolean.
  *
  * Scale shape: sketch construction is (1) a map-side-combining distinct on
  * `(group, hash)` then (2) the [[TopKRows]] bounded heap per group — each
  * input partition reduces to at most k rows per group before the shuffle,
  * so a billion-member set costs the same exchange as a thousand-member one.
  * The pairwise estimator only ever touches sketches (k rows per group), so
  * the G² pair grid is arithmetic on a few kilobytes per pair regardless of
  * corpus size. The EXACT intersection used as the gate's oracle twin is the
  * brute path — at 100 TB you run only the sketch.
  */
object KmvSketch {

  /** 2^31 - 1, prime — the modulus of the sketch hash. */
  val Modulus = 2147483647L
  private val MultA = 2654435761L
  private val AddB  = 40503L

  /** Deterministic injective hash of a long key into [0, Modulus): linear
    * map by a constant coprime to the prime modulus. Keys must be
    * non-negative and below the modulus for injectivity (callers compose
    * multi-part keys into one small long first).
    */
  def khash(key: Column): Column =
    pmod(key * lit(MultA) + lit(AddB), lit(Modulus))

  /** Per-group KMV sketch: the `k` smallest distinct hashes per group, as
    * `(group, h)` rows. Bounded memory end to end: the distinct combines
    * map-side and the k-min heap is a partial aggregate.
    */
  def sketch(df: DataFrame, group: String, key: Column, k: Int): DataFrame =
    df.select(col(group), khash(key).as("h")).distinct()
      .groupBy(group)
      .agg(TopKRows.topk_rows(struct(col("h").as("h1"), col("h").as("h2")),
        k, descending = false).as("sk"))
      .select(col(group), explode(col("sk")).as("r"))
      .select(col(group), col("r").getField("h1").as("h"))

  /** Pairwise Jaccard estimates between every unordered group pair from
    * their KMV sketches, via the union-sketch trick: the k smallest hashes
    * of sketch(A) ∪ sketch(B) are exactly the k smallest of hash(A ∪ B)
    * (each sketch already holds its set's k minima), i.e. a uniform sample
    * of the union — the fraction of the sample present in BOTH sketches
    * estimates |A∩B| / |A∪B|. Emits `(ga, gb, k_eff, kmv_both,
    * kmv_jaccard)` with `ga < gb`; `k_eff = min(k, |union sample|)` so
    * small sets degrade to the exact answer.
    */
  def pairOverlap(sk: DataFrame, group: String, k: Int): DataFrame = {
    val groups = sk.select(col(group).as("g2")).distinct()
    // replicate each sketch row onto every pair its group participates in;
    // the group list is tiny so the inequality join is a broadcast loop
    val tagged = sk
      .join(broadcast(groups), col(group) =!= col("g2"))
      .select(least(col(group), col("g2")).as("ga"),
        greatest(col(group), col("g2")).as("gb"),
        col("h"), col(group).as("src"))
    val flags = tagged.groupBy("ga", "gb", "h")
      .agg(max(when(col("src") === col("ga"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("src") === col("gb"), 1L).otherwise(0L)).as("in_b"))
    // k smallest of each pair's union sample — the per-pair axis is at most
    // 2k rows, so the bounded heap never sees more than the sketches
    flags
      .groupBy("ga", "gb")
      .agg(TopKRows.topk_rows(
        struct(col("h").as("h1"), col("h").as("h2"),
          col("in_a"), col("in_b")), k,
        descending = false).as("sm"))
      .select(col("ga"), col("gb"), explode(col("sm")).as("r"))
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("k_eff"),
        sum(col("r").getField("in_a") * col("r").getField("in_b"))
          .cast("long").as("kmv_both"))
      .select(col("ga"), col("gb"), col("k_eff"), col("kmv_both"),
        round(col("kmv_both").cast("double") / col("k_eff"), 6)
          .as("kmv_jaccard"))
  }

  /** Exact pairwise overlap over the full element sets — the brute oracle
    * twin of [[pairOverlap]] (quadratic in matching elements; gate-scale
    * only). Emits `(ga, gb, n_a, n_b, exact_inter, exact_jaccard)`.
    */
  def exactOverlap(elems: DataFrame, group: String, key: Column): DataFrame = {
    val el = elems.select(col(group).as("g"), key.as("m")).distinct()
    val sizes = el.groupBy("g").agg(count(lit(1)).as("n"))
    val inter = el.as("a")
      .join(el.as("b"),
        col("a.m") === col("b.m") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("ga"), col("b.g").as("gb"))
      .agg(count(lit(1)).as("exact_inter"))
    inter
      .join(broadcast(sizes.select(col("g").as("ga"), col("n").as("n_a"))), "ga")
      .join(broadcast(sizes.select(col("g").as("gb"), col("n").as("n_b"))), "gb")
      .select(col("ga"), col("gb"), col("n_a"), col("n_b"), col("exact_inter"),
        round(col("exact_inter").cast("double") /
          (col("n_a") + col("n_b") - col("exact_inter")), 6).as("exact_jaccard"))
  }
}
