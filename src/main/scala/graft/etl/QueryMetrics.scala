package graft.etl

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Physical-execution observability: a [[QueryExecutionListener]] that
  * captures, per completed action, the wall-clock duration plus the
  * executed plan's row-flow metrics — scan output rows (how much was
  * READ after pruning/filter pushdown) and result output rows (how
  * much came OUT). The numbers [[RunReport]]'s `observe()` metrics
  * deliberately don't cover: observe() measures the DATA (null counts,
  * contract violations), this measures the ENGINE (did pruning
  * actually cut the scan, did a filter stop being selective, is a
  * query suddenly reading 100× the rows at the same output size —
  * the regression class plan guardrails can't catch because the PLAN
  * didn't change, the data did).
  *
  * Driver-side state is a bounded lock-free queue of small records —
  * the listener adds no work to executors and no actions of its own
  * (reading `SQLMetric.value` after completion is free). Scale note:
  * at 100 TB nothing changes — metric values aggregate on the driver
  * per action regardless of data size; `maxEntries` bounds memory for
  * long-lived sessions (oldest entries drop first, like a ring
  * buffer). */
final class QueryMetricsListener(maxEntries: Int = 1000)
    extends QueryExecutionListener {

  import QueryMetricsListener.Entry

  private val entries = new ConcurrentLinkedQueue[Entry]()

  private def record(e: Entry): Unit = {
    entries.add(e)
    while (entries.size > maxEntries) entries.poll()
  }

  /** Pre-order flatten that SEES THROUGH AQE's wrapper nodes.
    * `AdaptiveSparkPlanExec` is a LeafExecNode — a plain
    * `collect`/`collectLeaves` stops at it and reports scanRows=0 /
    * outputRows=-1 for ANY query containing an exchange under AQE
    * (the default). Follow `executedPlan` (the final, post-reopt
    * plan), unwrap materialized query stages, and dereference reused
    * exchanges so the real scans and operators are visible. The
    * wrappers themselves are not emitted (they carry no row metrics
    * of their own). */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
  : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      flatten(q.plan)
    case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      // a reused exchange re-reads NOTHING (it serves the original
      // exchange's shuffle files) — traversing into it would double-
      // count the original subtree's scan rows, so emit nothing
      Seq.empty
    case other => other +: other.children.flatMap(flatten)
  }

  private def rowMetrics(qe: QueryExecution): (Long, Long) = {
    val nodes = flatten(qe.executedPlan)
    val scans = nodes.filter(_.children.isEmpty)
      .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    // the root (a write/command node) usually carries no row metric —
    // report the TOPMOST operator that does (pre-order)
    val out = nodes.find(_.metrics.contains("numOutputRows"))
      .map(_.metrics("numOutputRows").value).getOrElse(-1L)
    (scans, out)
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    val (scan, out) = rowMetrics(qe)
    record(Entry(funcName, durationNs / 1000000L, scan, out,
      failed = false))
  }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit =
    record(Entry(funcName, -1L, -1L, -1L, failed = true))

  /** Snapshot of captured entries, oldest first. */
  def snapshot(): Seq[Entry] = entries.asScala.toSeq

  def clear(): Unit = entries.clear()
}

object QueryMetricsListener {
  /** One completed action: `funcName` is the DataFrame action that
    * triggered execution; rows are summed over like-named metrics in
    * the executed plan tree (post-AQE final plan). Lives on the
    * companion (not the instance) so pattern matches need no outer
    * reference. */
  final case class Entry(funcName: String, durationMs: Long,
                         scanRows: Long, outputRows: Long,
                         failed: Boolean)

  /** Register a fresh listener on the session and return it (the
    * handle is what you snapshot/clear; deregister with
    * `spark.listenerManager.unregister`). */
  def attach(spark: SparkSession, maxEntries: Int = 1000)
  : QueryMetricsListener = {
    val l = new QueryMetricsListener(maxEntries)
    spark.listenerManager.register(l)
    l
  }
}
