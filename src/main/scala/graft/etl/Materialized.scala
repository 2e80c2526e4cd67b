package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance by partial-aggregate
  * merge — the pattern that keeps a 100 TB fact table's rollups fresh
  * without ever rescanning the fact table.
  *
  * The view is stored as COMMUTATIVE PARTIALS (counts, exact-decimal
  * sums, mins/maxes — anything Spark itself partial-aggregates
  * map-side), never as derived values: an average stored as `avg`
  * cannot absorb a delta, but (`sum`, `cnt`) can, and the derived
  * column is one cheap expression at read time. Refresh is then
  *
  *   merged = (stored partials ∪ delta partials) groupBy keys, SUM each
  *
  * whose shuffle carries |stored MV| + |delta| rows — both bounded by
  * key cardinality and batch size, NOT by the base table's history.
  * The alternative a naive pipeline runs — re-aggregate the whole fact
  * table per refresh — rescans the full 100 TB every batch; this scans
  * only the delta. Correctness contract (and the registered oracle):
  * merge(partials(A), partials(B)) == partials(A ∪ B) for any split,
  * which holds exactly because every stored column is a sum-mergeable
  * partial (count merges as sum; decimal sums are exact and
  * order-independent, the same determinism rule as [[graft.Qdsl.dsum]]).
  *
  * Reference analogue: the daily ADF re-aggregation job (nb03's
  * engagement rollup, reference notebooks/03_transform_gold.py) —
  * re-expressed as delta-only maintenance instead of a full recompute.
  */
object Materialized {

  /** Merge two partial-aggregate states sharing a schema: group by
    * `keys`, SUM every other column, preserving each partial's
    * declared type (sum over decimal widens; cast back so stored
    * state keeps one schema across refreshes). Either side may be
    * empty; keys absent from one side pass through from the other
    * (sum ignores the missing side's nulls). */
  def mergePartials(stored: DataFrame, delta: DataFrame,
                    keys: Seq[String]): DataFrame = {
    require(stored.columns.sameElements(delta.columns),
      s"partial schemas diverge: ${stored.columns.mkString(",")} vs " +
        delta.columns.mkString(","))
    val partials = stored.columns.filterNot(keys.contains)
    require(partials.nonEmpty, "no partial columns to merge")
    val aggs = partials.toIndexedSeq.map(c =>
      sum(col(c)).cast(stored.schema(c).dataType).as(c))
    stored.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
