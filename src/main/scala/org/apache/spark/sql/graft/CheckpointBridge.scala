package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic storage release for checkpointed Datasets.
  *
  * `Dataset.localCheckpoint` persists an internal RDD and wraps it in
  * a `LogicalRDD`, but exposes NO public way to unpersist it — the
  * blocks linger until the driver GCs the Dataset and the
  * ContextCleaner gets around to it. Iterative algorithms that
  * checkpoint per round (connected components, SSSP) would otherwise
  * accumulate superseded round states in executor storage for the
  * lifetime of the session. Same bridge technique as
  * [[ColumnBridge]]: an `org.apache.spark.sql` subpackage reaches the
  * `private[sql]` execution node. */
object CheckpointBridge {

  /** Unpersist the RDD behind a checkpointed Dataset (non-blocking;
    * no-op when the plan is not a checkpoint product). Only call on
    * datasets whose contents are no longer needed — a localCheckpoint
    * has TRUNCATED lineage, so evicted blocks cannot be recomputed. */
  def release(df: DataFrame): Unit = df.queryExecution.logical match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
