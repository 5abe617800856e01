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
  * materialized RDD; anything else no-ops.
  *
  * CONTRACT: only free checkpoints YOU created and no longer reference.
  * A localCheckpoint truncates lineage, so freeing a checkpointed frame
  * the CALLER still holds destroys it — later actions on it fail with
  * missing checkpoint blocks, unrecoverably. Derived (non-checkpointed)
  * frames no-op, but a caller-supplied frame that happens to be a
  * checkpoint must never be passed here; keep call sites restricted to
  * loop-internal checkpoints (every current site is).
  */
private[graft] object Checkpoints {
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
