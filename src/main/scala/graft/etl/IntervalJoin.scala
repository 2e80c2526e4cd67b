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
    * columns of both inputs.
    *
    * PRECONDITION: every interval must span at most
    * `maxBucketsPerInterval` buckets — the explode factor is
    * (hi-lo)/bucketWidth per interval, so a single open-ended sentinel
    * (hi = Long.MaxValue) would otherwise try to materialize a
    * ~10^13-element sequence and kill the job far less legibly. The
    * guard is enforced PER ROW inside the plan (no extra pass): an
    * offending interval fails the job with an actionable message —
    * widen `bucketWidth`, clamp sentinel `hi` values to the points'
    * max timestamp, or split giant intervals before the join. */
  def bucketed(points: DataFrame, tCol: String,
               intervals: DataFrame, loCol: String, hiCol: String,
               bucketWidth: Long, keys: Seq[String] = Nil,
               maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive: $maxBucketsPerInterval")
    val pb = points.withColumn("__bucket",
      floor(col(tCol) / lit(bucketWidth)).cast("long"))
    // hi is exclusive: an interval ending exactly on a bucket boundary
    // does not reach into that bucket — hence (hi - 1) for the last
    // one. Empty intervals (hi <= lo) are dropped BEFORE the explode:
    // sequence() would otherwise run backwards and invent buckets.
    val loB = floor(col(loCol) / lit(bucketWidth)).cast("long")
    val hiB = floor((col(hiCol) - 1) / lit(bucketWidth)).cast("long")
    val span = hiB - loB + lit(1L)
    val guardedHiB = when(span <= lit(maxBucketsPerInterval), hiB)
      .otherwise(raise_error(concat(
        lit("IntervalJoin.bucketed: interval ["), col(loCol).cast("string"),
        lit(", "), col(hiCol).cast("string"), lit(") spans "),
        span.cast("string"),
        lit(s" buckets (limit $maxBucketsPerInterval at width " +
          s"$bucketWidth); widen bucketWidth, clamp open-ended sentinel " +
          "hi values, or split giant intervals before the join"))))
    val ib = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("__bucket", explode(sequence(loB, guardedHiB)))
    pb.join(ib, keys :+ "__bucket")
      .filter(col(tCol) >= col(loCol) && col(tCol) < col(hiCol))
      .drop("__bucket")
  }
}
