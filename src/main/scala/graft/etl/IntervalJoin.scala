package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe interval (range) joins.
  *
  * Spark has no native interval-join operator: `points JOIN intervals
  * ON lo <= t AND t < hi` plans as BroadcastNestedLoopJoin (or a
  * cartesian product) — O(points × intervals) comparisons, a
  * guaranteed non-starter at 100 TB. The standard reformulation here
  * turns it into an EQUI-join: quantize time into fixed-width buckets,
  * explode each interval to every bucket it overlaps, join point
  * bucket = interval bucket (plus any real equi-keys, e.g. user_id),
  * then apply the exact range predicate. Cost becomes
  * O(points + intervals·spread + candidate matches), all through one
  * shuffled hash join on narrow keys.
  *
  * `bucketWidth` tunes duplication vs selectivity: buckets ≈ typical
  * interval length keep the explode factor ~2 while the join stays
  * sparse. Skewed buckets (one hot hour) are AQE's skew-join problem,
  * already enabled in the session.
  */
object IntervalJoin {

  /** Join `points` (timestamp column `tCol`, long) to `intervals`
    * ([`loCol`, `hiCol`) — inclusive lo, EXCLUSIVE hi) through
    * fixed-width buckets. `keys` are additional exact equi-join columns
    * present on both sides (they ride the same shuffle). Output: every
    * (point, interval) pair with the point inside the interval, all
    * columns of both inputs. */
  def bucketed(points: DataFrame, tCol: String,
               intervals: DataFrame, loCol: String, hiCol: String,
               bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val pb = points.withColumn("__bucket",
      floor(col(tCol) / lit(bucketWidth)).cast("long"))
    // hi is exclusive: an interval ending exactly on a bucket boundary
    // does not reach into that bucket — hence (hi - 1) for the last
    // one. Empty intervals (hi <= lo) are dropped BEFORE the explode:
    // sequence() would otherwise run backwards and invent buckets.
    val ib = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(loCol) / lit(bucketWidth)).cast("long"),
          floor((col(hiCol) - 1) / lit(bucketWidth)).cast("long"))))
    pb.join(ib, keys :+ "__bucket")
      .filter(col(tCol) >= col(loCol) && col(tCol) < col(hiCol))
      .drop("__bucket")
  }
}
