package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The engine-observability listener: row-flow metrics captured per
  * action, selectivity visible, failures recorded, ring bound held. */
class QueryMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def await[A](l: QueryMetricsListener, n: Int)(body: => A): A = {
    // listener callbacks are asynchronous — run the action, then wait
    // for the bus to drain before asserting
    val r = body
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (l.snapshot().size < n && System.nanoTime() < deadline)
      Thread.sleep(20)
    r
  }

  test("captures scan vs output rows — selectivity is visible") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qm")
    (1 to 1000).map(i => (i.toLong, i % 10)).toDF("id", "k")
      .write.parquet(s"$dir/t")
    // attach AFTER the fixture write: listener callbacks are async, so
    // an earlier action's late callback must not be in the snapshot
    val l = QueryMetricsListener.attach(spark)
    try {
      await(l, 1) {
        spark.read.parquet(s"$dir/t").filter(col("k") === 3)
          .write.format("noop").mode("overwrite").save()
      }
      val e = l.snapshot().last
      assert(!e.failed)
      assert(e.durationMs >= 0)
      // the scan read all 1000 rows (k is not a partition/pushdown-
      // eliminable predicate at row precision), the action emitted 100
      assert(e.scanRows == 1000, e)
      assert(e.outputRows == 100, e)
    } finally spark.listenerManager.unregister(l)
  }

  test("sees through AQE: shuffle query still reports scan rows") {
    // TestSpark runs with AQE on (the default), so any query with an
    // exchange executes under AdaptiveSparkPlanExec — a LeafExecNode
    // that hides the whole plan from a naive collectLeaves. The
    // listener must unwrap it or report scanRows=0 / outputRows=-1.
    val dir = java.nio.file.Files.createTempDirectory("graft_qm_aqe")
    (1 to 1000).map(i => (i.toLong, i % 10)).toDF("id", "k")
      .write.parquet(s"$dir/t")
    val l = QueryMetricsListener.attach(spark)
    try {
      await(l, 1) {
        spark.read.parquet(s"$dir/t")
          .groupBy("k").agg(sum("id").as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      val e = l.snapshot().last
      assert(!e.failed)
      assert(e.scanRows == 1000, e)   // the real parquet scan is visible
      assert(e.outputRows >= 0, e)    // some operator carries a metric
    } finally spark.listenerManager.unregister(l)
  }

  test("failures are recorded, and the ring bound holds") {
    val l = QueryMetricsListener.attach(spark, maxEntries = 3)
    try {
      intercept[Exception] {
        await(l, 1) {
          spark.range(10).select(expr("assert_true(id < 5)"))
            .write.format("noop").mode("overwrite").save()
        }
      }
      // give the failure callback time to land
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!l.snapshot().exists(_.failed) &&
        System.nanoTime() < deadline) Thread.sleep(20)
      assert(l.snapshot().exists(_.failed))
      l.clear()
      (1 to 5).foreach { i =>
        await(l, math.min(i, 3)) {
          spark.range(i).write.format("noop").mode("overwrite").save()
        }
      }
      assert(l.snapshot().size <= 3) // ring dropped the oldest
    } finally spark.listenerManager.unregister(l)
  }
}
