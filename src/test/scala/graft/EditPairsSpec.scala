package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** PassJoin segment blocking must be LOSSLESS vs brute-force levenshtein —
  * the lemma's edge cases are insertions/deletions (they SHIFT segment
  * positions; substitution-only fixtures would pass even with a broken
  * shift window) and keys shorter than maxDist+1 (degenerate segments,
  * routed through the short-key residual).
  */
class EditPairsSpec extends AnyFunSuite with SparkTestBase {

  private def brute(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, pa) <- rows; (ib, pb) <- rows if ia < ib
      ed = lev(pa, pb) if ed <= maxDist
    } yield (ia, ib, ed.toLong)).toSet
  }

  private def blocked(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val docs = rows.toDF("doc_id", "text")
    Dedup.editPairs(docs, col("text"), maxDist, idCap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("indel-heavy corpus: blocking finds exactly the brute-force pairs") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val rows: Seq[(Long, String)] = Seq(
      0L -> base,
      1L -> base.drop(1),                          // deletion at front (shifts all)
      2L -> base.drop(2),
      3L -> ("xy" + base),                         // insertions at front
      4L -> base.patch(20, "", 2),                 // deletion mid-string
      5L -> base.patch(40, "zz", 0),               // insertion mid-string
      6L -> base.patch(10, "Q", 1).patch(50, "W", 1), // two substitutions
      7L -> base.reverse,                          // far away
      8L -> (base + "!"),                          // append
      9L -> base.updated(0, 'T'),                  // single substitution
      10L -> base.patch(5, "ab", 0).patch(30, "", 1) // mixed indel
    )
    for (d <- 0 to 3)
      assert(blocked(rows, d) === brute(rows, d), s"maxDist=$d")
  }

  test("short keys (len <= maxDist) route through the residual, losslessly") {
    val rows: Seq[(Long, String)] = Seq(
      0L -> "", 1L -> "a", 2L -> "ab", 3L -> "abc", 4L -> "abcd",
      5L -> "b", 6L -> "xy", 7L -> "abcde", 8L -> "zabc")
    for (d <- 0 to 3)
      assert(blocked(rows, d) === brute(rows, d), s"maxDist=$d")
  }

  test("uniform-length keys: candidate count stays near the true pair count") {
    // 60 keys of identical length in 3 dissimilar families — uniform
    // lengths are exactly where length-band blocking degenerated to
    // all-pairs; segment-text keys must keep candidates ~= true pairs
    val rows: Seq[(Long, String)] = (0L until 60L).map { i =>
      val fam = "fam" + (i % 3)
      val body = s"$fam-payload-${"x" * 30}-tail"
      i -> (if (i < 3) body else body.updated(8, ('a' + (i % 26)).toChar))
    }
    for (d <- Seq(1, 2))
      assert(blocked(rows, d) === brute(rows, d), s"maxDist=$d")
  }

  test("maxDist=0 degenerates to an exact-key equi-join") {
    val rows: Seq[(Long, String)] = Seq(
      0L -> "same", 1L -> "same", 2L -> "other", 3L -> "same")
    assert(blocked(rows, 0) === Set((0L, 1L, 0L), (0L, 3L, 0L), (1L, 3L, 0L)))
  }
}
