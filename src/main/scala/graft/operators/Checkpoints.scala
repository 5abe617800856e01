package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared storage hygiene for iterate-to-fixpoint drivers: release a
  * `localCheckpoint`'s persisted blocks once an iteration no longer
  * references the frame. Without this every round of a loop driver
  * (k-core, label propagation, PageRank, power iteration, BPE training)
  * leaves its checkpoint blocks resident, accumulating executor storage
  * across the run on large inputs.
  *
  * A checkpointed Dataset analyzes to a `LogicalRDD` over its
  * materialized RDD; anything else no-ops — safe to call on caller
  * inputs and on derived (non-checkpointed) frames.
  */
private[graft] object Checkpoints {
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
