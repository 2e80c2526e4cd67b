package graft

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.graft.CheckpointBridge
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The deterministic-release bridge: a localCheckpoint's blocks are
  * actually freed on release (not left to the ContextCleaner), and
  * non-checkpoint frames are a safe no-op. */
class CheckpointBridgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("release unpersists a checkpointed dataset's storage") {
    val df = spark.range(1000).toDF("id").localCheckpoint(true)
    val rdd = df.queryExecution.logical.asInstanceOf[LogicalRDD].rdd
    assert(rdd.getStorageLevel != StorageLevel.NONE,
      "localCheckpoint should persist")
    CheckpointBridge.release(df)
    assert(rdd.getStorageLevel == StorageLevel.NONE,
      "release should unpersist the checkpointed RDD")
  }

  test("release is a no-op on plans that are not checkpoints") {
    CheckpointBridge.release(spark.range(10).toDF("id")) // must not throw
    CheckpointBridge.release(
      spark.range(10).toDF("id").groupBy("id").count())
  }

  test("a released lazy checkpoint that was never materialized is fine") {
    val df = spark.range(10).toDF("id").localCheckpoint(false)
    CheckpointBridge.release(df) // nothing persisted yet — no-op
  }
}
