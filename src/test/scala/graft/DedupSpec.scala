package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash64
import graft.operators.{Dedup, Similarity}

class DedupSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = docs(Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup
    (4L, "completely different words entirely unrelated text here now"),
    (5L, "the  QUICK   brown fox jumps over the lazy dog") // ws/case variant
  ))

  test("exact dedup keeps the lowest doc_id per identical text") {
    val kept = Dedup.exact(corpus).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L, 5L))
  }

  test("fingerprint dedup collapses whitespace/case variants") {
    val kept = Dedup.byFingerprint(corpus).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L)) // 5 now collapses onto 1 too
  }

  test("brute-force jaccard finds the near-dup pair and skips unrelated docs") {
    val pairs = Dedup.jaccardPairs(corpus, tau = 0.5, idCap = 100L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash-LSH candidates reproduce brute-force pairs at tau=0.5 on this corpus") {
    val brute = Dedup.jaccardPairs(corpus, tau = 0.5, idCap = 100L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(corpus, tau = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === brute) // identical sets get identical signatures => full recall
  }

  test("hot-bucket triangular decomposition emits the identical pair set") {
    // 40 exact copies + noise: every copy lands in the SAME (band, bh)
    // bucket in all 16 bands — the boilerplate shape that melts a plain
    // band self-join into one B^2 task. cap=3 forces k = ceil(40/3) = 14
    // blocks, exercising same-block, cross-block and cold-bucket paths;
    // the guarded candidate set must be bit-identical to the unguarded one
    val boiler = docs(
      (0L until 40L).map(i => i -> "standard legal boilerplate text repeated verbatim") ++
      Seq(100L -> "an unrelated document about rivers and mountains",
          101L -> "another distinct text with its own vocabulary entirely"))
    def pairs(cap: Int) = Dedup.minhashLsh(boiler, tau = 0.8, hotBucketCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val guarded = pairs(3)
    assert(guarded === pairs(Int.MaxValue))
    assert(guarded.size === 40 * 39 / 2) // all copy pairs, nothing else
  }

  test("incremental near-dup matches only across the history split") {
    // 1,2 history copies; 10 a new copy (must match both), 11 a new copy
    // of another new doc only (12) — new x new must NOT surface; 13 is
    // history-only near-dup-free noise
    val c = docs(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (13L, "totally different historical content right here"),
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "one two three four five six seven eight nine"),
      (12L, "one two three four five six seven eight nine")))
    def run(cap: Int) = Dedup.minhashLshIncremental(c, col("doc_id") < 10L,
        tau = 0.8, hotBucketCap = cap)
      .select("doc_id", "hist_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run(Int.MaxValue)
    assert(got === Set((10L, 1L), (10L, 2L)))
    // the bipartite hot-bucket guard must not change the result set
    assert(run(1) === got)
  }

  test("simhash is deterministic and near-dups land within hamming 3") {
    val fnv1 = SimHash64.fnv1a64("abc".getBytes("UTF-8"))
    val fnv2 = SimHash64.fnv1a64("abc".getBytes("UTF-8"))
    assert(fnv1 === fnv2)
    val pairs = Dedup.simhashNearDup(corpus, maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical docs: distance 0
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("connected components assign the min reachable id across chains") {
    val s = spark
    import s.implicits._
    // chain 1-2-3 (1 and 3 never directly paired), separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("cosine pairs flag planted duplicates only") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f)), // near dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.cosinePairs(emb, tau = 0.95, idCap = Long.MaxValue)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("prefix filtering is lossless: pair set equals brute force") {
    // a corpus with shared stopwords (which must land at the order's tail,
    // out of every prefix) and genuine near-dup clusters
    val c = docs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "a completely different document about spark and scala"),
      (5L, "a completely different document about spark and java"),
      (6L, "the the the unrelated filler text goes here now")
    ))
    def norm(df: DataFrame) = df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val tau = 0.5
    assert(norm(Dedup.prefixJaccardPairs(c, tau, idCap = 100L)) ===
           norm(Dedup.jaccardPairs(c, tau, idCap = 100L)))
  }

  test("semantic pairs compare within quantizer cells only and verify exactly") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f)),  // near dup of 1, same cell
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.01f, 0.99f, 0.0f))   // near dup of 3, other cell
    ).toDF("vec_id", "embedding")
    val centers = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val got = Dedup.semanticPairs(emb, centers, tau = 0.9, idCap = Long.MaxValue)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0, 1L, 2L), (1, 3L, 4L)))
    // the cross-cell pair (1,3) etc. is never even scored — blocked by cell
  }

  test("brute-force ANN ranks the closest vector first") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (5L, Array(0.95f, 0.05f)), (6L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, nQueries = 1, k = 2)
      .orderBy("sim").collect()
    val ids = top.map(_.getAs[Long]("neighbor_id")).toSet
    assert(ids === Set(5L, 1L)) // 6 is orthogonal, never in top-2
  }
}
