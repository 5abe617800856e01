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

  private def qCols(v: Column): (Column, Column) = {
    val maxAbs = array_max(transform(v, x => abs(x)))
    val scale = when(maxAbs === 0d, lit(1d)).otherwise(maxAbs / 127d)
    val qv = transform(v, x => floor(x / scale + 0.5d).cast("long"))
    (scale, qv)
  }

  /** `(vec_id, scale, qv)` — the quantized corpus as it would be stored
    * (int8-range longs; parquet dictionary/byte packing does the rest).
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val (scale, qv) = qCols(VectorFunctions.asDouble(col("embedding")))
    emb.select(col("vec_id"), scale.as("scale"), qv.as("qv"))
  }

  /** Dequantized vectors for downstream exact math. */
  def dequantize(q: DataFrame): DataFrame =
    q.select(col("vec_id"),
      transform(col("qv"), x => x * col("scale")).as("v"))

  /** Gate shape: per-vector scalar summaries of the quantized array
    * (sum/min/max pin every element without emitting array columns the
    * driver's comparator can't hash).
    */
  def quantizeSummary(emb: DataFrame): DataFrame = {
    val (scale, qv) = qCols(VectorFunctions.asDouble(col("embedding")))
    emb.select(col("vec_id"),
      round(scale, 6).as("scale_r"),
      aggregate(qv, lit(0L), (a, x) => a + x).as("q_sum"),
      array_min(qv).as("q_min"),
      array_max(qv).as("q_max"))
  }
}
