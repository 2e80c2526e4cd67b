package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Quality, Transforms}
import graft.ingest.Ingest
import graft.model.Schemas
import graft.sources.Sources

/** Entry point A (SURVEY §3.1): the orchestrated ETL run.
  *
  * The reference splits this across an ADF DAG (three sequential
  * Databricks notebooks, then three parallel SQL copies); here stage
  * boundaries are function boundaries in one driver program:
  *
  *   ingest (bronze JSON) → transform (silver star schema) →
  *   validate/dedup → write silver parquet ∥∥∥ (gold casts)
  *
  * The three silver writes are independent jobs — Spark schedules them
  * concurrently when issued from separate threads; at this volume
  * sequential writes are indistinguishable, so they stay sequential
  * and simple.
  */
object Pipeline {

  case class Conf(rawPath: String, silverPath: String,
                  mediaIds: Seq[String], lookbackDays: Int = 7,
                  clock: Option[Column] = None,
                  retrySleep: Long => Unit = Thread.sleep)

  case class Result(dimMedia: DataFrame, dimVisitor: DataFrame,
                    fact: DataFrame, goldFact: DataFrame,
                    qualityReports: Map[String, DataFrame])

  /** Stage 1 — ingestion (nb02 semantics): read watermark, fetch pages
    * per media id through the retrying fetcher, write bronze JSON dirs
    * named `{media}_{yyyyMMdd_HHmmss}` (the names ARE the lineage —
    * §2.1 S7/P9 depends on them), commit watermark.
    *
    * The watermark advances ONLY when every media id fetched cleanly.
    * A fetch that exhausts its retries (Ingest.RetriesExhausted) is
    * not end-of-pages: whatever landed for other ids stays in bronze
    * (replays converge — the writes are per-run-dir overwrites) but
    * the watermark holds, so the next incremental run re-requests the
    * window that was never fully seen. Committing anyway would skip
    * the unfetched pages forever. Returns true iff the run was clean
    * and the watermark advanced. */
  def ingest(spark: SparkSession, conf: Conf, fetcher: Ingest.Fetcher,
             runTs: java.time.Instant = java.time.Instant.now())
  : Boolean = {
    val metaPath = s"${conf.rawPath}/metadata/last_run"
    // incremental pull: the visitor fetch asks the API only for events
    // newer than the last successful run (nb02:247 since=last_run_date);
    // the media catalog is small and always pulled in full, as in nb02
    val since = Ingest.readWatermark(spark, metaPath, conf.lookbackDays,
      runTs)
    val stamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)
      .format(runTs)
    var clean = true
    conf.mediaIds.foreach { id =>
      try {
        val media = Ingest.fetchAllPages(fetcher, id, "media",
          sleep = conf.retrySleep)
        if (media.nonEmpty)
          Ingest.writeBronzeJson(spark, media,
            s"${conf.rawPath}/media/${id}_$stamp", Schemas.rawMedia)
        val visitors = Ingest.fetchAllPages(fetcher, id, "visitors",
          since = Some(since), sleep = conf.retrySleep)
        if (visitors.nonEmpty)
          Ingest.writeBronzeJson(spark, visitors,
            s"${conf.rawPath}/visitors/${id}_$stamp", Schemas.rawVisitor)
      } catch {
        case _: Ingest.RetriesExhausted => clean = false
      }
    }
    if (clean) Ingest.commitWatermark(spark, metaPath, runTs.toString)
    clean
  }

  /** Stages 2-4 — transform, validate, dedup, write silver + gold.
    * Every DQ metric is a single-pass aggregation; silver frames are
    * cached at their materialization points instead of recomputing the
    * bronze scan per action (the reference re-ran its lineage ~20×,
    * SURVEY §4.3.1). */
  def transform(spark: SparkSession, conf: Conf): Result = {
    val clock = conf.clock.getOrElse(current_timestamp())

    val rawMedia = Sources.readBronzeJson(spark,
      s"${conf.rawPath}/media/*/", Schemas.rawMedia, multiline = false)
    val rawVisitors = Sources.readBronzeJson(spark,
      s"${conf.rawPath}/visitors/*/", Schemas.rawVisitor,
      multiline = false)

    val dimMedia = Quality.dedupByKeys(
      Transforms.dimMedia(rawMedia, clock),
      Seq("media_id"), Seq(col("title"), col("url"))).cache()
    val dimVisitor = Quality.dedupByKeys(
      Transforms.dimVisitor(rawVisitors, clock),
      Seq("visitor_id"), Seq(col("ip_address"), col("country"))).cache()
    val fact = Quality.filterValidKeys(
      Transforms.factEngagement(
        Transforms.withMediaIdFromPath(rawVisitors), clock),
      Seq("media_id", "visitor_id")).cache()

    val reports = Map(
      "dim_media" -> Quality.qualityReport(dimMedia, Seq("media_id")),
      "dim_visitor" -> Quality.qualityReport(dimVisitor, Seq("visitor_id")),
      "fact" -> Quality.qualityReport(fact,
        Seq("media_id", "visitor_id", "date")))

    Sources.writeSilverParquet(dimMedia, s"${conf.silverPath}/dim-media")
    Sources.writeSilverParquet(dimVisitor,
      s"${conf.silverPath}/dim-visitor")
    // fact partitioned by date: partition pruning for every downstream
    // date-ranged query (100 TB posture, SURVEY §7.4.7)
    Sources.writeSilverParquet(fact, s"${conf.silverPath}/fact-engagement",
      partitionCol = Some("date"))

    Result(dimMedia, dimVisitor, fact, Transforms.goldCastFact(fact),
      reports)
  }

  /** Full run: ingest → transform. */
  def run(spark: SparkSession, conf: Conf, fetcher: Ingest.Fetcher)
  : Result = {
    ingest(spark, conf, fetcher)
    transform(spark, conf)
  }
}
