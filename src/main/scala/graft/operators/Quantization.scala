package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Embedding quantization: symmetric per-vector int8 — the 4x storage /
  * bandwidth cut that makes a 100 TB embedding corpus scannable. Scale is
  * `max(|x|)/127`; values quantize as `floor(x/scale + 0.5)` — spelled as
  * floor(+0.5) rather than round() so both engines (and any re-reader)
  * compute the identical tie behavior from identical doubles.
  */
object Quantization {

  private def scaleCol(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x)))
    when(maxAbs === 0d, lit(1d)).otherwise(maxAbs / 127d)
  }

  /** Staged projections, not one fused expression: `scale` contains an
    * O(dim) array_max, and referencing it inside the quantize lambda would
    * re-evaluate it per ELEMENT (O(dim^2) per row — measured 8x on the
    * gate). Materializing it as a column referenced twice keeps
    * CollapseProject from inlining it back into the lambda.
    */
  private def staged(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"), scaleCol(col("v")).as("scale"))
      .select(col("vec_id"), col("scale"),
        transform(col("v"), x => floor(x / col("scale") + 0.5d).cast("long")).as("qv"))

  /** `(vec_id, scale, qv)` — the quantized corpus as it would be stored
    * (int8-range longs; parquet dictionary/byte packing does the rest).
    */
  def quantizeInt8(emb: DataFrame): DataFrame = staged(emb)

  /** Dequantized vectors for downstream exact math. */
  def dequantize(q: DataFrame): DataFrame =
    q.select(col("vec_id"),
      transform(col("qv"), x => x * col("scale")).as("v"))

  /** Gate shape: per-vector scalar summaries of the quantized array
    * (sum/min/max pin every element without emitting array columns the
    * driver's comparator can't hash).
    */
  def quantizeSummary(emb: DataFrame): DataFrame =
    staged(emb).select(col("vec_id"),
      round(col("scale"), 6).as("scale_r"),
      aggregate(col("qv"), lit(0L), (a, x) => a + x).as("q_sum"),
      array_min(col("qv")).as("q_min"),
      array_max(col("qv")).as("q_max"))
}
