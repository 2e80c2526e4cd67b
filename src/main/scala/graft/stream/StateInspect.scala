package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline inspection of Structured Streaming STATE — the
  * observability a stateful job needs at 100 TB and the reference has
  * no answer to (its ADF monitor sees activity status, never state).
  *
  * Both readers are batch data sources over a streaming CHECKPOINT
  * directory, so they run against a live job's checkpoint without
  * stopping it (checkpoints are append-only; a batch reader sees the
  * last committed snapshot):
  *
  *  - `state-metadata` lists every stateful operator in the query:
  *    ids, names, store names, partition counts, batch-id range — the
  *    map of what state exists.
  *  - `statestore` reads the keys/values of one operator's store at
  *    the last committed batch (or `batchId`) — dedup keys held, open
  *    sessions, join buffer rows.
  *
  * What this buys in production: answering "why is state growing"
  * (key histogram by partition_id → skewed state partition), "is the
  * watermark evicting" (retained keys vs horizon), and "what exactly
  * is buffered for user X" — all without instrumenting the job or
  * replaying the stream. The readers are full DataFrames, so every
  * graft operator (skew report, exact/approx distinct, joins back to
  * the input) composes with them; `stream_state_inspect` gates the
  * audit invariants end-to-end.
  */
object StateInspect {

  /** Operator map of a checkpoint: one row per stateful operator ×
    * store (operatorId, operatorName, stateStoreName, numPartitions,
    * minBatchId, maxBatchId). */
  def stateMetadata(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("state-metadata").load(checkpoint)

  /** Key/value rows of one operator's state store at the last
    * committed batch (or `batchId`): columns `key` and `value` are
    * structs mirroring the operator's state schema, plus
    * `partition_id` — which makes per-partition state skew directly
    * measurable with a groupBy. */
  def stateRows(spark: SparkSession, checkpoint: String,
                operatorId: Long = 0L, storeName: String = "default",
                batchId: Option[Long] = None): DataFrame = {
    val reader = spark.read.format("statestore")
      .option("operatorId", operatorId)
      .option("storeName", storeName)
    batchId.foreach(b => reader.option("batchId", b))
    reader.load(checkpoint)
  }
}
