package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Silver-layer transforms: raw bronze JSON → star schema.
  *
  * Re-expresses `wistia-Databricks notebool-03.py` Spark-first. Semantic
  * quirks of the reference are preserved verbatim (SURVEY.md §7.4.5):
  * the fixed `/10.0` play-rate denominator (nb03:229), channel inferred
  * from title substrings (nb03:137-140), the hardcoded URL prefix
  * (nb03:136), and events filtered to `type == 'play'` only (nb03:224).
  *
  * Differences from the reference that are deliberate (SURVEY.md §4.3):
  *  - the clock is injectable (`processedAt`) so tests/oracles are
  *    deterministic instead of `current_timestamp()` everywhere;
  *  - surrogate-key backfill uses a content hash rather than
  *    `monotonically_increasing_id()` (partition-dependent, nb03:152);
  *  - schemas are explicit, never inferred.
  */
object Transforms {

  /** Hardcoded in the reference at nb03:136. */
  val UrlPrefix = "https://wistia.com/series/health/videos/"

  private def emptyToNull(c: Column): Column = nullif(c, lit(""))

  /** Deterministic surrogate-key backfill for null/empty keys.
    * Reference uses `concat('media_', monotonically_increasing_id())`
    * (nb03:149-154); that is partition-dependent, so we derive the
    * surrogate from a hash of the whole row instead — same coverage
    * (no null/empty keys survive), reproducible across runs/partitions.
    */
  def backfillKey(key: String, prefix: String)(df: DataFrame): DataFrame = {
    val others = df.columns.filterNot(_ == key).map(col).toSeq
    df.withColumn(key,
      when(col(key).isNull || trim(col(key)) === "",
        concat(lit(prefix), sha2(to_json(struct(others: _*)), 256)))
        .otherwise(col(key)))
  }

  /** dim_media: project/rename, null defaults, URL build, channel
    * classification, cast-guarded created timestamp, distinct, key
    * backfill (nb03:133-154). */
  def dimMedia(rawMedia: DataFrame,
               processedAt: Column = current_timestamp()): DataFrame =
    rawMedia
      .select(
        col("hashed_id").as("media_id"),
        coalesce(col("name"), lit("Unknown")).as("title"),
        concat(lit(UrlPrefix), col("hashed_id")).as("url"),
        when(lower(col("name")).contains("facebook"), "Facebook")
          .when(lower(col("name")).contains("youtube"), "YouTube")
          .when(lower(col("name")).contains("instagram"), "Instagram")
          .otherwise("Wistia").as("channel"),
        // try_cast, not cast: ANSI mode (Spark 4 default) makes a plain
        // cast THROW on malformed input; the reference's guard expects
        // null-on-failure (nb03:141-143).
        when(col("created").try_cast("bigint").isNotNull,
          to_timestamp(from_unixtime(col("created").try_cast("bigint"))))
          .otherwise(processedAt).as("created_at"),
        processedAt.as("processed_at"))
      .distinct()
      .transform(backfillKey("media_id", "media_"))

  /** dim_visitor: project/rename, null defaults, distinct, key backfill
    * (nb03:170-183). */
  def dimVisitor(rawVisitors: DataFrame,
                 processedAt: Column = current_timestamp()): DataFrame =
    rawVisitors
      .select(
        col("visitor_key").as("visitor_id"),
        coalesce(col("ip_address"), lit("Unknown")).as("ip_address"),
        coalesce(col("country"), lit("Unknown")).as("country"),
        processedAt.as("processed_at"))
      .distinct()
      .transform(backfillKey("visitor_id", "visitor_"))

  /** Recover `media_id` lineage from the bronze directory name via the
    * reference's two-pattern regexp fallback (nb03:200-205):
    * primary `/visitors/([a-z0-9]+)_\d{8}_\d{6}/`, fallback
    * `/visitors/([a-z0-9]+)_`. Requires a real file scan (uses the
    * `_metadata.file_path` hidden column, Spark >= 3.2 built-in). */
  def withMediaIdFromPath(rawVisitors: DataFrame): DataFrame =
    rawVisitors
      .withColumn("file_path", col("_metadata.file_path"))
      .withColumn("media_id", coalesce(
        emptyToNull(regexp_extract(col("file_path"),
          "/visitors/([a-z0-9]+)_\\d{8}_\\d{6}/", 1)),
        emptyToNull(regexp_extract(col("file_path"),
          "/visitors/([a-z0-9]+)_", 1))))

  /** fact_media_engagement: the analytics core (nb03:198-243).
    *
    * Plan shape: Project → Filter(size>0) → Generate(explode) →
    * Filter(type='play') → Aggregate(media,visitor,date) → Project →
    * Filter(null keys). The groupBy exchange on
    * (media_id, visitor_id, date) is the only required shuffle.
    * At 100 TB the input arrives date-partitioned and the aggregate is
    * partial+final (map-side combine) automatically, so the shuffle
    * moves pre-aggregated rows only.
    *
    * Input must already carry `media_id` (see [[withMediaIdFromPath]]).
    */
  def factEngagement(visitorsWithMedia: DataFrame,
                     loadedAt: Column = current_timestamp(),
                     dropNullKeys: Boolean = true): DataFrame = {
    // Plan-time schema introspection (reference nb03:215, P16): a batch
    // with no `events` column yields an empty fact of the right shape.
    if (!visitorsWithMedia.columns.contains("events"))
      return visitorsWithMedia.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        graft.model.Schemas.factEngagement)
    val agg = visitorsWithMedia
      .transform(backfillKey("visitor_key", "visitor_"))
      .filter(col("events").isNotNull && size(col("events")) > 0)
      .select(col("media_id"), col("visitor_key").as("visitor_id"),
        explode(col("events")).as("event"))
      .filter(col("event.type") === "play")
      .withColumn("event_date", to_date(from_unixtime(col("event.time"))))
      .groupBy(col("media_id"), col("visitor_id"),
        col("event_date").as("date"))
      .agg(
        count(lit(1)).as("play_count"),
        // Reference quirk preserved verbatim: fixed denominator 10.0
        // (nb03:229). Do not "fix".
        round(count(lit(1)) / lit(10.0), 2).as("play_rate"),
        round(sum(coalesce(col("event.duration_watched").cast("double"),
          lit(0.0))), 2).as("total_watch_time_seconds"),
        round(avg(coalesce(col("event.percent_watched").cast("double"),
          lit(0.0))), 2).as("avg_percent_watched"))
      .withColumn("loaded_at", loadedAt)
    // the reference's trailing null-key drop (nb03:243) stays the
    // default; the pipeline passes dropNullKeys = false and routes
    // these rows to the dead-letter sink instead — a row whose media
    // lineage the dir-name regexps could not recover is an OPERATIONAL
    // signal (a misnamed bronze dir), not noise to swallow
    if (dropNullKeys)
      agg.filter(col("media_id").isNotNull && col("visitor_id").isNotNull &&
        col("date").isNotNull)
    else agg
  }

  /** Gold-layer type narrowing, replicating the ADF TabularTranslator
    * (`wistia-Azure-Data-Factory-ETL-Pipeline.json:388-489`): renames
    * `total_watch_time_seconds → total_watch_time` (int) and
    * `avg_percent_watched → watched_percent` (decimal(5,2)),
    * `play_rate → decimal(5,2)`, `play_count → int`, truncation allowed.
    */
  def goldCastFact(fact: DataFrame): DataFrame =
    fact.select(
      col("media_id"), col("visitor_id"), col("date"),
      col("play_count").cast(IntegerType).as("play_count"),
      col("play_rate").cast(DecimalType(5, 2)).as("play_rate"),
      col("total_watch_time_seconds").cast(IntegerType)
        .as("total_watch_time"),
      col("avg_percent_watched").cast(DecimalType(5, 2))
        .as("watched_percent"),
      col("loaded_at"))
}
