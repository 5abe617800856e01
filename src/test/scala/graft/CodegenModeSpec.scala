package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RollingHash, SetSimilarity, SimHash64, TextFunctions}

/** Proves the custom expressions' doGenCode actually COMPILES: with the
  * codegen factory forced to CODEGEN_ONLY, a Janino failure throws instead
  * of silently falling back to interpreted eval.
  */
class CodegenModeSpec extends AnyFunSuite with SparkTestBase {

  test("simhash64 and minhash_sig evaluate under CODEGEN_ONLY") {
    // an ISOLATED session (own SessionState/conf over the shared context):
    // suites run in parallel against one shared session, and flipping the
    // codegen factory mode there would make any concurrently-running
    // CodegenFallback projection (e.g. MediaMetaSpec) throw
    val s = spark.newSession()
    import s.implicits._
    val prev = s.conf.getOption("spark.sql.codegen.factoryMode")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq((1L, "the quick brown fox"), (2L, "jumps over dogs"), (3L, "tiny"))
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          SimHash64.simhash64(TextFunctions.distinctTokens(col("text"))).as("sh"),
          SetSimilarity.minhash_sig(TextFunctions.distinctTokens(col("text")), 64).as("sig"),
          RollingHash.rolling_hashes(col("text"), 8).as("rh"))
      val rows = df.collect()
      assert(rows.length === 3)
      assert(rows.forall(_.getSeq[Long](2).length === 64))
      // "tiny" is shorter than the window -> empty hash array, not a crash
      assert(rows.find(_.getLong(0) == 3L).get.getSeq[Long](3).isEmpty)
      // codegen path must agree with the interpreted eval path
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2), r.getSeq[Long](3))).toSeq ===
             interp.map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2), r.getSeq[Long](3))).toSeq)
    } finally {
      prev match {
        case Some(v) => s.conf.set("spark.sql.codegen.factoryMode", v)
        case None => s.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
