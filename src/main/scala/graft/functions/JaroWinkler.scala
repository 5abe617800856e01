package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler, ASA 1990) as a native codegen'd
  * expression — the verify step of blocked entity-resolution joins, where a
  * Scala UDF would break whole-stage codegen on exactly the hot path (the
  * B-per-block candidate pairs).
  *
  * Semantics pinned to the textbook form DuckDB's
  * `jaro_winkler_similarity` implements (validated case-by-case against it,
  * including the odd-transposition and window-0 edges):
  *  - match window `max(0, max(|a|,|b|)/2 - 1)`;
  *  - transpositions = floor(mismatched-aligned-matches / 2);
  *  - either side empty → 0.0;
  *  - prefix boost `+ p·0.1·(1-jaro)` with p = common prefix capped at 4,
  *    applied only when jaro > 0.7 (the classic boost threshold).
  */
case class JaroWinklerSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"jaro_winkler expects string args, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  // one static call keeps the expression inside whole-stage codegen (the
  // same delegation shape as Spark's own Levenshtein → UTF8String method)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.similarity($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerImpl {
  /** Called from generated code — must stay public and static-shaped.
    *
    * ASCII fast path: when every byte of both operands is < 0x80, byte
    * index == char index and byte equality == char equality, so the
    * char-based algorithm runs directly on the UTF8String bytes with ZERO
    * per-pair String allocation — this sits on exactly the B² verify hot
    * path [[graft.operators.Dedup.blockedPairs]] feeds. Any multi-byte
    * input falls back to the validated String form; `simAscii` and `sim`
    * must stay semantically in lockstep (spec-pinned on random inputs).
    */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val na = a.numBytes; val nb = b.numBytes
    if (isAscii(a, na) && isAscii(b, nb)) simAscii(a, na, b, nb)
    else sim(a.toString, b.toString)
  }

  private def isAscii(s: UTF8String, n: Int): Boolean = {
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Byte-indexed twin of [[sim]] for all-ASCII operands. */
  private def simAscii(s1: UTF8String, l1: Int, s2: UTF8String, l2: Int): Double = {
    if (l1 == 0 || l2 == 0) return 0.0
    val d = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + d)
      var j = math.max(0, i - d)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.getByte(i) == s2.getByte(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.getByte(i) != s2.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2 // floor — DuckDB-validated on the odd-t 3-cycle case
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val pmax = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < pmax && s1.getByte(p) == s2.getByte(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }

  def sim(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val d = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + d)
      var j = math.max(0, i - d)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2 // floor — DuckDB-validated on the odd-t 3-cycle case
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val pmax = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < pmax && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }
}

object JaroWinkler {
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinklerSim(ColumnShim.expression(a), ColumnShim.expression(b)))
}
