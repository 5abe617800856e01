package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling (Rabin-Karp polynomial) hashes of every `k`-byte window of a
  * string — the building block for winnowing-style document fingerprints:
  * each window hash is `sum b[i] * B^(k-1-i)` over the window bytes in a
  * 64-bit ring, updated in O(1) per shift. Deterministic across JVMs.
  *
  * Use [[RollingHash.doc_fingerprint]] (min window hash) for a locality-
  * insensitive per-document fingerprint that tolerates edits outside the
  * minimizing window — cheaper than MinHash when one hash suffices.
  */
case class RollingHashes(child: Expression, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"rolling_hashes expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val B = RollingHash.Base
    // B^(k-1) for the outgoing byte
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    out(0) = h
    i = k
    while (i < n) {
      h = (h - (bytes(i - k) & 0xffL) * pow) * B + (bytes(i) & 0xffL)
      out(i - k + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes"); val n = ctx.freshName("n")
      val pow = ctx.freshName("pow"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val out = ctx.freshName("out")
      val B = s"${RollingHash.Base}L"
      s"""
         |byte[] $bytes = $in.getBytes();
         |int $n = $bytes.length;
         |long[] $out;
         |if ($n < $k) {
         |  $out = new long[0];
         |} else {
         |  $out = new long[$n - $k + 1];
         |  long $pow = 1L;
         |  for (int $i = 0; $i < $k - 1; $i++) $pow *= $B;
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) $h = $h * $B + ($bytes[$i] & 0xffL);
         |  $out[0] = $h;
         |  for (int $i = $k; $i < $n; $i++) {
         |    $h = ($h - ($bytes[$i - $k] & 0xffL) * $pow) * $B + ($bytes[$i] & 0xffL);
         |    $out[$i - $k + 1] = $h;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
  override def prettyName: String = "rolling_hashes"
}

object RollingHash {
  /** Odd multiplier with good avalanche in a 2^64 ring (same family as
    * FNV/PCG multipliers; any fixed odd constant works for fingerprints).
    */
  val Base = 0x100000001b3L

  def rolling_hashes(c: Column, k: Int): Column =
    ColumnShim.column(RollingHashes(ColumnShim.expression(c), k))

  /** Min window hash over the canonical text — a single-long fingerprint
    * stable under edits that don't touch the minimizing window.
    */
  def doc_fingerprint(text: Column, k: Int = 16): Column = {
    import org.apache.spark.sql.functions._
    array_min(rolling_hashes(regexp_replace(lower(trim(text)), "\\s+", " "), k))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
    * local algorithms for document fingerprinting", SIGMOD 2003): the
    * distinct minima of every `w`-hash sliding window over the k-gram
    * rolling hashes. The winnowing guarantee: any substring match of at
    * least `w + k - 1` characters between two documents surfaces as a
    * shared fingerprint — the plagiarism/boilerplate detector that
    * per-document min hashes cannot give. Selected set size is ~2/(w+1)
    * of the hash count, so the fingerprint index stays a fraction of the
    * corpus.
    *
    * Pure columnar composition (`transform`/`slice`/`array_min` over the
    * codegen'd rolling-hash expression) — no UDF; a shorter-than-w hash
    * array degenerates to one whole-array window (the standard guarantee
    * vacuously holds). DuckDB replays the identical selection as a
    * windowed `min() OVER (ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING)`
    * over the exported hashes, which is how the gate stays hash-checked.
    */
  def winnow(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.functions._
    val hs = rolling_hashes(text, k)
    when(size(hs) === 0, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), greatest(size(hs) - w, lit(0))),
        i => array_min(slice(hs, i + 1, lit(w))))))
  }
}
