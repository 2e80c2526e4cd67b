package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Qdsl

/** Distributed exact ranking without a global sort.
  *
  * `Qdsl.boundedWindow(...).ntile(n)` funnels the ENTIRE relation through a
  * single task (one global sort partition) — correct at test scale, a
  * guaranteed OOM/stall at 100 TB. The equivalent here reconstructs each
  * row's exact global rank from two scale-safe pieces:
  *
  *   1. a value-level CDF over the AGGREGATED distinct order values —
  *      the only unpartitioned window in the plan, and it runs on the
  *      aggregate, so its size is bounded by the value domain (e.g.
  *      ~1.1M possible cent values for a TPC-H acctbal) no matter how
  *      many rows the input has;
  *   2. a per-value `row_number` partitioned BY the order value (ties
  *      broken by `tieBreak`) — a partitioned window whose skew is
  *      bounded by the duplicate count of the hottest value.
  *
  * global rank = cdf(count of rows below this value) + rank-within-value,
  * and the NTILE bucket formula applied to that rank reproduces the
  * window function's assignment bit-for-bit, ties split across buckets
  * and all.
  */
object Ranking {

  /** Exact NTILE(`n`) over (`orderCol`, `tieBreak`) with no full-table
    * single-reducer window; adds an `ntile` int column. `tieBreak`
    * must make the order total (unique within each order value) — the
    * same requirement the deterministic window formulation has.
    *
    * PRECONDITION — bounded value domain: the CDF window runs over the
    * DISTINCT values of `orderCol`, so it is scale-safe exactly when
    * that cardinality is bounded (e.g. TPC-H `c_acctbal`: decimal cents
    * in a fixed range ⇒ ≤1.1M values at ANY row count). On a continuous
    * column where distinct ≈ rows, the "aggregated" window degenerates
    * back into the single-task global sort this exists to avoid — use
    * [[ntileApprox]] there instead.
    *
    * NULL order values rank first (Spark's NULLS FIRST default for
    * ascending windows): the CDF sort puts the null group first and the
    * join back is null-safe (`<=>`), so the window-NTILE equivalence
    * holds on nullable columns too. */
  def ntileByValue(df: DataFrame, orderCol: String, tieBreak: String,
                   n: Int): DataFrame = {
    val cdfW = Qdsl.boundedWindow(col(orderCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Qdsl.boundedAll // whole relation — but the AGGREGATED one
    val cdf = df.groupBy(orderCol).agg(count(lit(1)).as("cnt"))
      .select(col(orderCol).as("__ord"),
        (sum(col("cnt")).over(cdfW) - col("cnt")).as("below"),
        sum(col("cnt")).over(allW).as("n_total"))
    val inVal = Window.partitionBy(col(orderCol)).orderBy(col(tieBreak))
    val rk = col("below") + row_number().over(inVal)
    // NTILE semantics for 1-based rank rk over n_total rows: the first
    // (n_total mod n) buckets hold base+1 rows, the rest hold base
    val base = floor(col("n_total") / lit(n))
    val rem = col("n_total") % lit(n)
    val cut = rem * (base + lit(1))
    val bucket = when(rk <= cut,
        floor((rk - lit(1)) / (base + lit(1))) + lit(1))
      .otherwise(rem + floor((rk - lit(1) - cut) /
        greatest(base, lit(1L))) + lit(1)) // greatest guards n_total < n
    df.join(cdf, df(orderCol) <=> cdf("__ord"))
      .withColumn("ntile", bucket.cast("int"))
      .drop("__ord", "below", "n_total")
  }

  /** Approximate NTILE for CONTINUOUS order columns, where
    * [[ntileByValue]]'s bounded-domain precondition fails: bucket
    * boundaries come from `approx_percentile` (one aggregate — no
    * window anywhere in the plan), rows are assigned by comparing
    * against the n-1 broadcast boundaries. Bucket populations are
    * approximate at the boundaries (that is the trade); every row is
    * assigned, boundaries are exact corpus values, and the plan
    * contains zero unpartitioned windows at any cardinality. NULL
    * order values go to bucket 1, mirroring NULLS FIRST. */
  def ntileApprox(df: DataFrame, orderCol: String, n: Int,
                  accuracy: Int = 10000): DataFrame = {
    val probs = (1 until n).map(_.toDouble / n)
    val bounds = df.agg(expr(
      s"approx_percentile($orderCol, array(${probs.mkString(",")}), " +
        s"$accuracy)").as("bs"))
    df.crossJoin(broadcast(bounds))
      .withColumn("ntile",
        when(col(orderCol).isNull, lit(1)).otherwise(
          aggregate(col("bs"),
            lit(1),
            (acc, b) => acc + when(col(orderCol) > b, 1).otherwise(0))))
      .drop("bs")
  }
}
