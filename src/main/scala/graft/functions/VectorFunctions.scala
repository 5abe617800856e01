package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built from
  * codegen'd `functions._` lambdas (`zip_with`/`aggregate`) — no UDFs, so
  * the whole similarity computation stays inside whole-stage codegen.
  *
  * Accumulation is left-to-right, matching DuckDB's `list_dot_product`
  * fold order so oracle comparisons are bit-stable before rounding.
  */
object VectorFunctions {

  /** Cast to double once so all arithmetic is f64 (testdata stores f32). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine = dot/(|a|*|b|) — the codegen'd [[CosineSim]] expression (one
    * fused loop; ~40x the lambda-composed form on the sf0.1 pair join).
    * Same left-to-right accumulation and `sqrt(aa)*sqrt(bb)` denominator as
    * the oracle expression, so values stay bit-compatible.
    */
  def cosine(a: Column, b: Column): Column = CosineSim.cosine_sim(a, b)

  /** The composable-builtin form of [[cosine]] (kept for cross-checking
    * the custom expression in tests).
    */
  def cosineBuiltin(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (for IVF/LSH bucketing). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Sign sketch against a fixed hyperplane: bit = (dot(v, plane) >= 0).
    * Used by the LSH-bucketed ANN path: `k` planes give a `k`-bit bucket id,
    * turning the all-pairs cosine join into an equi-join on bucket.
    */
  def signBit(v: Column, plane: Seq[Double]): Column = {
    val planeCol = array(plane.map(lit): _*)
    (dot(v, planeCol) >= 0).cast("int")
  }

  /** Bucket id from `planes.length` sign bits (big-endian). */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.foldLeft(lit(0L)) { (acc, p) => acc * 2 + signBit(v, p).cast("long") }
}
