package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Power iteration for the dominant eigenvector of a (symmetric) matrix
  * held as a `(i, j, m)` coordinate DataFrame — PCA's first component when
  * the matrix is the embedding Gram/covariance. The reference has no
  * linear-algebra surface; this is the iterate-until-converged operator
  * API behind the `embed_pca_power` hash gate, whose unrolled two steps
  * are exactly `iterate(gram, dim, maxIters = 2, tolMicros = -1)`.
  *
  * Arithmetic is the gate's exact-integer convention: the vector is held
  * at ±`unit` (1e5) renormalized by max-|w| each step with truncating
  * `div`, so every step is deterministic and engine-portable, and a
  * converged vector is a true integer fixpoint. Scale shape: the matrix
  * axis is bounded (embedding dims — 64..4096), so the vector broadcasts
  * and each step is one join + keyed sum over the coordinate table; the
  * convergence probe is one scalar aggregate of the (tiny) vector.
  */
object PowerIteration {

  /** Iterate `v <- normalize(M v)` until the vector moves by at most
    * `tolMicros` in L1 (sum of |Δ| in `unit`-scaled coordinates) or
    * `maxIters` steps. `tolMicros < 0` forces exactly `maxIters` steps
    * (the hash-gate pin). Returns `(j, v)` with `v` in ±`unit`.
    */
  def iterate(gram: DataFrame, dim: Int, maxIters: Int = 50,
              tolMicros: Long = 0L, unit: Long = 100000L): DataFrame = {
    val s: SparkSession = gram.sparkSession
    var v = s.range(dim.toLong).select(col("id").cast("int").as("j"),
      lit(unit).as("v"))
    var it = 0
    var moved = Long.MaxValue
    while (it < maxIters && moved > tolMicros) {
      val w = gram.join(broadcast(v), "j")
        .groupBy(col("i").as("dim")).agg(sum(col("m") * col("v")).as("w"))
      val mx = w.agg(max(abs(col("w"))).as("mx"))
      val next = w.crossJoin(broadcast(mx))
        .select(col("dim").as("j"), expr(s"(w * ${unit}L) div mx").as("v"))
        .localCheckpoint() // cut lineage: each step otherwise re-plans all priors
      if (tolMicros >= 0L) {
        moved = next.join(v.withColumnRenamed("v", "pv"), "j")
          .agg(sum(abs(col("v") - col("pv"))).as("m"))
          .head().getLong(0)
      }
      // release the prior step's checkpoint blocks (see [[Checkpoints]])
      Checkpoints.free(v)
      v = next
      it += 1
    }
    v
  }
}
