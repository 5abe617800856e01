package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Jaccard similarity of two SORTED, DISTINCT `array<string>` columns via a
  * single merge-intersection pass — O(n+m), no per-pair hash sets, fully
  * codegen'd. The composable `array_intersect` form builds a hash set per
  * pair per call (and we need the value twice: threshold + output).
  *
  * Counts are integers, so the resulting double is bit-identical to the
  * oracle's `len(list_intersect(..))/...` expression as long as inputs are
  * distinct sets — callers must pre-apply `array_sort(array_distinct(...))`.
  */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"jaccard_sorted expects array<string> args, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val inter = ctx.freshName("inter"); val c = ctx.freshName("c")
      val union = ctx.freshName("union")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $n && $j < $m) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) $i++;
         |  else $j++;
         |}
         |int $union = $n + $m - $inter;
         |${ev.value} = $union == 0 ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sorted"
}

/** [[JaccardSorted]] over sorted `array<long>` (pre-hashed set elements):
  * the merge compares longs instead of UTF8 strings — ~6x cheaper per pair
  * for shingle sets. Hash the elements with a 64-bit hash upstream; the
  * distinct-count semantics survive because collisions within a document's
  * shingle set are ~n^2/2^64.
  */
case class JaccardSortedLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"jaccard_sorted_long expects array<long> args, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val union = ctx.freshName("union")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |int $union = $n + $m - $inter;
         |${ev.value} = $union == 0 ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedLong =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sorted_long"
}

/** MinHash signature in one fused pass: `sig[p] = min over tokens of
  * (a_p * h(token) + b_p) mod P` for `numHashes` fixed-seed permutations.
  * The composable form (`numHashes` × `array_min(transform(...))`) walks a
  * lambda chain per permutation per row; this computes each token's base
  * hash once and updates all permutation minima in a tight loop.
  * Deterministic across JVMs (FNV-1a base hash, seeded permutation
  * constants) — a hard requirement for the LSH band join.
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<string>, got $other")
  }

  @transient private lazy val perms: Array[(Long, Long)] = MinHashSig.perms(numHashes)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(MinHashSig.P - 1)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = java.lang.Math.floorMod(
          SimHash64.fnv1a64(arr.getUTF8String(i).getBytes), MinHashSig.P)
        var p = 0
        while (p < numHashes) {
          val v = (perms(p)._1 * h + perms(p)._2) % MinHashSig.P
          if (v < sig(p)) sig(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // permutation constants flattened to [a0, b0, a1, b1, ...] and shipped
    // as a codegen reference object — no per-row allocation of the table
    val flat = ctx.addReferenceObj("minhashPerms",
      perms.flatMap(p => Array(p._1, p._2)), "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, ${MinHashSig.P}L - 1L);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = java.lang.Math.floorMod(
         |      graft.functions.SimHash64$$.MODULE$$.fnv1a64($a.getUTF8String($i).getBytes()),
         |      ${MinHashSig.P}L);
         |    for (int $p = 0; $p < $numHashes; $p++) {
         |      long $v = ($flat[2 * $p] * $h + $flat[2 * $p + 1]) % ${MinHashSig.P}L;
         |      if ($v < $sig[$p]) $sig[$p] = $v;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Mersenne prime 2^31-1: products of two < 2^31 operands fit in a Long. */
  val P = 2147483647L

  def perms(numHashes: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numHashes)(
      (1L + rnd.nextInt((P - 1).toInt).toLong, rnd.nextInt(P.toInt).toLong))
  }
}

object SetSimilarity {
  def jaccard_sorted(a: Column, b: Column): Column =
    ColumnShim.column(JaccardSorted(ColumnShim.expression(a), ColumnShim.expression(b)))
  def jaccard_sorted_long(a: Column, b: Column): Column =
    ColumnShim.column(JaccardSortedLong(ColumnShim.expression(a), ColumnShim.expression(b)))
  def minhash_sig(toks: Column, numHashes: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(toks), numHashes))
}
