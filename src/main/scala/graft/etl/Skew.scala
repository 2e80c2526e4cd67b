package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot join keys at scale.
  *
  * AQE's skew-join split (enabled in the sessions) handles most skew at
  * runtime by splitting oversized shuffle partitions. Salting is the
  * plan-level complement for the pathological case AQE can't fix: one
  * join KEY so hot that a single key's rows exceed an executor
  * (10⁸ events for one video). Salting spreads one key over
  * `saltFactor` reducers at the cost of replicating the small side
  * `saltFactor`×.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, with the large side salted
    * into `saltFactor` sub-keys and the small side replicated across
    * all salt values. Result columns = large ++ (small minus key), like
    * a plain `join(small, Seq(key))`.
    *
    * The salt is derived from a hash of the large side's whole row
    * (deterministic, partition-independent) — never `rand()`, which
    * breaks retry/replay semantics at scale. LIMIT: if a hot key's rows
    * are BIT-IDENTICAL (no timestamp/id column differs), they all hash
    * to one salt bucket and the key stays hot. Pass a `disambiguator`
    * column to mix into the salt for that case — since the rows are
    * identical, ANY spread of the copies yields the same join result,
    * so even a partition-dependent disambiguator like
    * `monotonically_increasing_id()` is semantically safe there. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int,
                 disambiguator: Option[Column] = None): DataFrame = {
    val largeCols = large.columns.toSeq
    val salted = large.withColumn("__salt",
      pmod(hash(largeCols.map(col) ++ disambiguator.toSeq: _*),
        lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    val out = salted.join(replicated, Seq(key, "__salt")).drop("__salt")
    // restore large-side column order first, like a plain key join
    val smallCols = small.columns.filterNot(_ == key).toSeq
    out.select((largeCols ++ smallCols).map(col): _*)
  }

  /** Per-key frequency report to decide WHICH keys need salting:
    * groupBy(key).count() descending — run on a sample at scale. */
  def keySkewReport(df: DataFrame, key: String, topN: Int = 20)
  : DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("rows"))
      .orderBy(col("rows").desc, col(key))
      .limit(topN)
}
