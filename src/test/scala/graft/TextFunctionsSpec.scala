package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.Multimodal

class TextFunctionsSpec extends AnyFunSuite with SparkTestBase {

  private def one(text: String) = {
    val s = spark
    import s.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("token count splits on any whitespace run") {
    val got = one("  the quick\tbrown\n fox ")
      .select(TextFunctions.tokenCount(col("text"))).head().getLong(0)
    assert(got === 4L)
  }

  test("stopword ratio counts occurrences, not distinct matches") {
    val got = one("the cat the dog the bird")
      .select(TextFunctions.stopwordRatio(col("text"))).head().getDouble(0)
    assert(got === 0.5) // 3 x "the" / 6 tokens
  }

  test("language id votes markers with deterministic tie-break") {
    def lang(t: String) =
      one(t).select(TextFunctions.langId(col("text"))).head().getString(0)
    assert(lang("the cat and the dog") === "en")
    assert(lang("el perro y la casa que") === "es")
    assert(lang("der hund und die katze") === "de")
    assert(lang("xyzzy plugh") === "und")
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "Hello   World"), (2L, "hello world")).toDF("doc_id", "text")
    val fps = df.select(TextFunctions.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
  }

  test("shingles produce distinct n-grams of consecutive tokens") {
    val got = one("a b c b c")
      .select(TextFunctions.shingles(col("text"), 2)).head().getSeq[String](0)
    assert(got.toSet === Set("a b", "b c", "c b"))
  }

  test("winnowing guarantee: a shared substring of w+k-1 chars shares a fingerprint") {
    import graft.functions.RollingHash
    val s = spark
    import s.implicits._
    val k = 8; val w = 4
    val shared = "UNIQUEmatchBLOCK" // 16 >= w + k - 1 = 11 chars
    val docs = Seq(
      (1L, s"aaa bbb ccc $shared ddd eee fff"),
      (2L, s"zzz yyy $shared xxx www vvv uuu qqq"),
      (3L, "completely different content with no overlap at all here"))
      .toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        RollingHash.winnow(col("text"), k, w).as("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty)  // the guarantee
    assert((fps(1L) & fps(3L)).isEmpty)   // disjoint docs: no collision here
    // selection only ever picks window minima of the underlying hashes
    val raw = docs.filter(col("doc_id") === 1L)
      .select(RollingHash.rolling_hashes(col("text"), k)).head().getSeq[Long](0).toSet
    assert(fps(1L).subsetOf(raw))
    // density: winnowing keeps ~2/(w+1) of hashes, far below all of them
    assert(fps(1L).size < raw.size)
    // short text: fewer hashes than w still yields the whole-array min
    val short = Seq((9L, "abcdefghij")).toDF("doc_id", "text") // 3 hashes < w
      .select(RollingHash.winnow(col("text"), k, w)).head().getSeq[Long](0)
    assert(short.length === 1)
    // shorter than k: no hashes, empty fingerprint set, no crash
    val none = Seq((9L, "abc")).toDF("doc_id", "text")
      .select(RollingHash.winnow(col("text"), k, w)).head().getSeq[Long](0)
    assert(none.isEmpty)
  }

  test("multimodal feature extraction is partition-parallel over the binary column") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "hello", "src0", 100L), (2L, "worldworld", "src3", 700L))
      .toDF("doc_id", "text", "source", "n_chars")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.mediaFrame(docs).repartition(2)).collect()
    assert(feats.length === 2)
    assert(feats.forall(_.histogram.sum > 0))
  }
}
