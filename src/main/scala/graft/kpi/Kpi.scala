package graft.kpi

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** KPI / reporting layer: K1-K11 from the reference's DAX measure set and
  * dashboard spec (implementation-guide PDF p.33-34; SURVEY.md §2.7).
  *
  * All fact⋈dim joins are star-schema equi-joins where the dim side is
  * small → `broadcast()` explicitly so the plan is a BroadcastHashJoin
  * with no shuffle of the fact side, at any scale (dims stay ≪ fact).
  *
  * Numeric policy for oracle determinism: double measures are summed as
  * DECIMAL(18,2) (exact, shuffle-order-independent — float sums are not
  * associative) and cast back to double at the end.
  */
object Kpi {

  private def dsum(colName: String) =
    sum(col(colName).cast(DecimalType(18, 2))).cast("double")

  /** K1 Total Plays: SUM(fact[play_count]). */
  def totalPlays(fact: DataFrame, playCol: String): DataFrame =
    fact.agg(dsum(playCol).as("total_plays"))

  /** K2 Avg Completion: AVERAGE(fact[watched_percent]), computed as
    * exact-decimal sum / count so the double division is identical in
    * any engine. */
  def avgCompletion(fact: DataFrame, pctCol: String): DataFrame =
    fact.agg((dsum(pctCol) / count(col(pctCol))).as("avg_completion"))

  /** K3 Total Watch Hours: SUM(total_watch_time)/3600. */
  def totalWatchHours(fact: DataFrame, secondsCol: String): DataFrame =
    fact.agg((dsum(secondsCol) / lit(3600.0)).as("total_watch_hours"))

  /** K4 Engagement Rate: DIVIDE(SUM(play_count), DISTINCTCOUNT(visitor)).
    * Null-safe divide like DAX DIVIDE. */
  def engagementRate(fact: DataFrame, playCol: String,
                     visitorCol: String): DataFrame =
    fact.agg(
      (dsum(playCol) /
        nullif(count_distinct(col(visitorCol)).cast("double"), lit(0.0)))
        .as("engagement_rate"))

  /** K5 Videos by Channel: COUNTROWS(dim_media) by channel (donut). */
  def videosByChannel(dimMedia: DataFrame, channelCol: String): DataFrame =
    dimMedia.groupBy(col(channelCol).as("channel"))
      .agg(count(lit(1)).as("n_videos"))
      .orderBy("channel")

  /** K6 Daily Plays Trend: plays by date, ordered (line chart). */
  def dailyTrend(fact: DataFrame, dateCol: String,
                 playCol: String): DataFrame =
    fact.groupBy(col(dateCol).as("date"))
      .agg(dsum(playCol).as("total_plays"))
      .orderBy("date")

  /** K7 Video Performance table: per-title plays / completion / watch
    * time. fact ⋈ broadcast(dim). */
  def videoPerformance(fact: DataFrame, dimMedia: DataFrame,
                       joinKey: String, titleCol: String, playCol: String,
                       pctCol: String, secondsCol: String): DataFrame =
    fact.join(broadcast(dimMedia), Seq(joinKey))
      .groupBy(col(titleCol).as("title"))
      .agg(
        dsum(playCol).as("total_plays"),
        (dsum(pctCol) / count(col(pctCol))).as("avg_completion"),
        dsum(secondsCol).as("total_watch_time"))
      .orderBy("title")

  /** K8 Top 10 Videos by Plays (bar chart top-N). TakeOrdered physical
    * op — no global sort materialization; ties broken by title so the
    * result is a deterministic set. */
  def topVideos(perf: DataFrame, n: Int = 10): DataFrame =
    perf.orderBy(col("total_plays").desc, col("title")).limit(n)

  /** K9 Visitors by Country: fact ⋈ broadcast(dim_visitor) rollup. */
  def byCountry(fact: DataFrame, dimVisitor: DataFrame, joinKey: String,
                countryCol: String, playCol: String,
                visitorCol: String): DataFrame =
    fact.join(broadcast(dimVisitor), Seq(joinKey))
      .groupBy(col(countryCol).as("country"))
      .agg(
        dsum(playCol).as("total_plays"),
        count_distinct(col(visitorCol)).as("unique_visitors"))
      .orderBy("country")

  /** K10 New vs Returning Visitors: first-seen date per visitor via a
    * window min, then daily split. One shuffle on visitor for the
    * window, one on date for the rollup. */
  def newVsReturning(fact: DataFrame, visitorCol: String,
                     dateCol: String): DataFrame = {
    val w = Window.partitionBy(col(visitorCol))
    fact
      .withColumn("first_seen", min(col(dateCol)).over(w))
      .withColumn("is_new",
        when(col(dateCol) === col("first_seen"), 1).otherwise(0))
      .groupBy(col(dateCol).as("date"), col("is_new"))
      .agg(count_distinct(col(visitorCol)).as("visitors"))
      .orderBy("date", "is_new")
  }

  /** K11 Unique Visitors card. */
  def uniqueVisitors(fact: DataFrame, visitorCol: String): DataFrame =
    fact.agg(count_distinct(col(visitorCol)).as("unique_visitors"))
}
