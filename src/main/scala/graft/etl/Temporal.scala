package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable temporal operators: as-of join and gap sessionization —
  * extracted from the registered queries (`asof_join`,
  * `session_batch`) so library users can call them on their own
  * frames; the queries delegate here, so the DuckDB oracles gate these
  * implementations directly.
  */
object Temporal {

  /** As-of (backward) join: for each left row, the single latest right
    * row with `right.ts <= left.ts` for the same key — composed from
    * built-ins (SURVEY §7.3 preference (a)): tag both sides, union,
    * one running `last(ignoreNulls)` window partitioned by key. ONE
    * shuffle on the key, no range-join explosion, skew bounded by the
    * hottest key like any keyed window.
    *
    * Both inputs must contain `keyCol` and `tsCol`; the output is the
    * left frame plus `asofCol` = the matched right row's `valueCol`
    * (null when no right row precedes). Ties
    * on ts: the right row sorts BEFORE the left row at the same
    * timestamp (a quote AT the trade's timestamp matches it), multiple
    * right rows at one ts resolve to the largest `valueCol`. */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keyCol: String,
                       tsCol: String, valueCol: String,
                       asofCol: String): DataFrame = {
    val valueType = right.schema(valueCol).dataType
    val l = left.withColumn("__is_left", lit(1))
      .withColumn("__asof_v", lit(null).cast(valueType))
    val r = right
      .withColumn("__is_left", lit(0))
      .withColumn("__asof_v", col(valueCol))
      .select(l.columns.toIndexedSeq
        .filter(c => c != "__is_left" && c != "__asof_v")
        .map(c =>
          if (c == keyCol || c == tsCol) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
        ++ Seq(col("__is_left"), col("__asof_v")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__is_left"), col("__asof_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asofCol, last(col("__asof_v"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__asof_v")
  }

  /** Batch gap sessionization: 30-min-default sessions via lag + an
    * explicitly ROWS-framed running sum, partitioned by `keyCol` —
    * the batch twin of the streaming sessionizers (and the oracle twin
    * of `stream_sessions`). `tieBreak` totalizes the per-key order.
    * Output: one row per (key, session_id) with n_events and
    * session_start/end in the units of `tsCol`. */
  def sessionizeBatch(df: DataFrame, keyCol: String, tsCol: String,
                      tieBreak: String,
                      gap: Long = 1800L * 1000000L): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieBreak))
    val newSess = when(
      col(tsCol) - lag(col(tsCol), 1).over(byKey) > lit(gap), 1)
      .otherwise(0)
    val runFrame = byKey.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    df.withColumn("__new_sess", newSess)
      .withColumn("session_id", sum(col("__new_sess")).over(runFrame))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start_us"),
        max(col(tsCol)).as("session_end_us"))
  }

  /** Linear interpolation of missing measures in a keyed time series:
    * a null `valueCol` is filled from its nearest non-null neighbors
    * in time,
    *   v = prev + (next − prev) · (ts − ts_prev) / (ts_next − ts_prev)
    * — the standard sensor/metric gap repair. Two `last/first
    * (ignoreNulls)` running windows over ONE key shuffle (the
    * bracketing values and their timestamps ride the same frames); no
    * self-join, no explode. Leading/trailing gaps (no bracket on one
    * side) stay null — extrapolation is a policy decision left to the
    * caller; a zero-width bracket (both neighbors at the same ts)
    * takes the previous value. `tieBreak` totalizes the per-key order
    * so the window (and therefore the fill) is deterministic under
    * equal timestamps. */
  def interpolateLinear(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, tieBreak: String,
                        outCol: String = "value_interp"): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieBreak))
    val before = order.rowsBetween(Window.unboundedPreceding, -1)
    val after = order.rowsBetween(1, Window.unboundedFollowing)
    val v = col(valueCol)
    val tsIfV = when(v.isNotNull, col(tsCol))
    val prevV = last(v, ignoreNulls = true).over(before)
    val prevT = last(tsIfV, ignoreNulls = true).over(before)
    val nextV = first(v, ignoreNulls = true).over(after)
    val nextT = first(tsIfV, ignoreNulls = true).over(after)
    val fraction = (col(tsCol) - prevT).cast("double") /
      (nextT - prevT).cast("double")
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(prevV.isNotNull && nextV.isNotNull,
          when(nextT === prevT, prevV)
            .otherwise(prevV + (nextV - prevV) * fraction)))
  }
}
