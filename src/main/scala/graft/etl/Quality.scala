package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality machinery: validation, dedup, quality report.
  *
  * Replaces the reference's ~20 repeated `filter().count()` actions
  * (`notebool-03.py:262-346`, each re-running the full uncached lineage)
  * with single-pass aggregations — same metrics, one job
  * (SURVEY.md §4.3.1). At 100 TB the reference pattern means ~20 full
  * re-scans; this is one.
  */
object Quality {

  private def isEmptyStr(c: Column): Column = c.isNull || trim(c) === ""

  /** Null/empty counts for each key column in ONE aggregation pass
    * (vs nb03:262-281's per-column filter().count() actions).
    * Output: total_rows, <key>_null_or_empty per key. */
  def validateKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    val metrics = count(lit(1)).as("total_rows") +:
      keys.map(k => count(when(isEmptyStr(col(k)), 1))
        .as(s"${k}_null_or_empty"))
    df.agg(metrics.head, metrics.tail: _*)
  }

  /** The "final safety check" (nb03:284-300): drop rows with any
    * null/empty key. */
  def filterValidKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.filter(keys.map(k => !isEmptyStr(col(k))).reduce(_ && _))

  /** Duplicate-group report (nb03:311-313, 326-329):
    * groupBy(keys).count().filter(count > 1). */
  def duplicateGroups(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Window dedup, keep-first (nb03:315-317). The reference orders by
    * `lit(1)` — a nondeterministic "arbitrary first" (SURVEY.md §4.3.4);
    * we keep the operator but order by `orderCols` (callers pass a total
    * order, e.g. all non-key columns) so the survivor is deterministic.
    */
  def dedupByKeys(df: DataFrame, keys: Seq[String],
                  orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("row_num", row_number().over(w))
      .filter("row_num = 1")
      .drop("row_num")
  }

  /** Full quality report as a ZERO-extra-pass observation: total rows,
    * approximate distinct keys (HLL++ — `observe()` disallows exact
    * distinct aggregates, and at 100 TB the approximate count is the
    * one you want anyway), per-key null/empty counts, and — when
    * `expectations` are given — one `expect_<rule>` violation count per
    * contract rule (the [[checkExpectations]] metrics riding the same
    * observation, so contract checking stays zero extra jobs too). All
    * collected as a side effect of whatever action materializes the
    * frame (the silver write in [[graft.Pipeline.transform]]). */
  def observedReport(df: DataFrame, name: String, keys: Seq[String],
                     expectations: Seq[Expectation] = Nil)
  : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val metrics = Seq(
      count(lit(1)).as("total_rows"),
      approx_count_distinct(struct(keys.map(col): _*))
        .as("approx_distinct_keys")) ++
      keys.map(k => count(when(isEmptyStr(col(k)), 1))
        .as(s"${k}_null_or_empty")) ++
      expectations.map(e => count(when(!coalesce(e.predicate, lit(false)),
        1)).as(s"expect_${e.name}"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** A named data contract: `predicate` evaluating TRUE means the row
    * passes. NULL predicate results count as violations (a rule that
    * cannot be evaluated on a row has not been satisfied by it). */
  case class Expectation(name: String, predicate: Column)

  /** Evaluate a set of expectations in ONE aggregation pass: output is
    * a single row of total_rows plus one violation count per rule —
    * the dbt-tests/Great-Expectations shape without N table scans. At
    * 100 TB this is one job however many rules there are; compose with
    * `observe()` by passing the same metric expressions if the frame
    * is being written anyway. */
  def checkExpectations(df: DataFrame,
                        expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "no expectations given")
    val metrics = count(lit(1)).as("total_rows") +:
      expectations.map(e =>
        count(when(!coalesce(e.predicate, lit(false)), 1)).as(e.name))
    df.agg(metrics.head, metrics.tail: _*)
  }

  /** DEAD-LETTER split: route rows that fail any expectation to a
    * quarantine side carrying WHY they failed, instead of silently
    * dropping them (`filterValidRows`) or failing the job. The
    * operational contract of a 100 TB ingest: bad rows must neither
    * poison the silver layer nor vanish — they land in a quarantine
    * sink with machine-readable reasons, get alerted on, and replay
    * after the producer is fixed.
    *
    * `_errors` is the comma-joined list of failed rule names in
    * declaration order (a NULL predicate result counts as a failure,
    * same as [[checkExpectations]] — NULL means the rule could not
    * prove the row valid). One scan, no shuffle: the split is two
    * filters over the same tagged projection, and writing both sides
    * still reads the source once per sink like any fan-out write. */
  def quarantine(df: DataFrame, rules: Seq[Expectation])
  : (DataFrame, DataFrame) = {
    val tagged = tagErrors(df, rules)
    (tagged.filter(col("_errors") === "").drop("_errors"),
      tagged.filter(col("_errors") =!= ""))
  }

  /** The tagged intermediate [[quarantine]] splits: every row with its
    * `_errors` list. Callers that write BOTH sides (the pipeline's
    * silver + dead-letter fan-out) cache this frame and filter it
    * twice, so the upstream lineage — at 100 TB, the whole bronze
    * scan + transform — evaluates once instead of once per sink. */
  def tagErrors(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    df.withColumn("_errors", concat_ws(",", rules.map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name))): _*))
  }

  /** Quality report in one pass (vs nb03:335-346's count/count-distinct
    * action storm). Exact distinct via count_distinct plus the
    * 100 TB-scale variant approx_count_distinct (HLL++, no exact
    * distinct shuffle of the full key space). */
  def qualityReport(df: DataFrame, keys: Seq[String]): DataFrame = {
    val metrics = Seq(
      count(lit(1)).as("total_rows"),
      count_distinct(struct(keys.map(col): _*)).as("distinct_keys"),
      approx_count_distinct(struct(keys.map(col): _*))
        .as("approx_distinct_keys")) ++
      keys.map(k => count(when(isEmptyStr(col(k)), 1))
        .as(s"${k}_null_or_empty"))
    df.agg(metrics.head, metrics.tail: _*)
  }
}
