package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Ingest

/** Entry point A end-to-end: canned-fetcher ingest → bronze dirs →
  * silver star schema → gold cast, all through the real file layer
  * (the bronze dir names carry the media-id lineage). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sinceSeen =
    scala.collection.mutable.Map[String, Option[String]]()
  private val fetcher = new Ingest.Fetcher {
    def fetchPage(id: String, endpoint: String, page: Int,
                  since: Option[String]): Option[String] = {
      sinceSeen(endpoint) = since
      if (page > 1) None
      else if (endpoint == "media")
        Some(s"""{"hashed_id":"$id","name":"Video $id on YouTube","created":1700000000}""")
      else
        Some(s"""{"visitor_key":"vis_$id","ip_address":"9.9.9.9","country":"DE","events":[{"type":"play","time":1700000000,"duration_watched":"5","percent_watched":"50"},{"type":"end","time":1700000500,"duration_watched":"1","percent_watched":"100"}]}""")
    }
  }

  test("full run: ingest → silver → gold, lineage through dir names") {
    val root = Files.createTempDirectory("graft_pipe").toString
    val conf = Pipeline.Conf(s"$root/raw", s"$root/silver",
      mediaIds = Seq("abc1", "zzz9"),
      clock = Some(to_timestamp(lit("2024-06-01 00:00:00"))))
    val res = Pipeline.run(spark, conf, fetcher,
    )
    assert(res.dimMedia.count() == 2)
    assert(res.dimVisitor.count() == 2)
    val fact = res.fact.collect()
    assert(fact.length == 2)
    assert(fact.map(_.getAs[String]("media_id")).toSet ==
      Set("abc1", "zzz9")) // recovered from the bronze dir names
    assert(fact.forall(_.getAs[Long]("play_count") == 1)) // 'end' excluded
    // silver parquet landed, fact partitioned by date
    assert(graft.sources.Sources.exists(spark,
      s"$root/silver/fact-engagement"))
    assert(graft.sources.Sources.listDir(spark,
      s"$root/silver/fact-engagement").exists(_.contains("date=")))
    // gold narrowing applied
    assert(res.goldFact.schema("watched_percent").dataType.simpleString
      == "decimal(5,2)")
    // watermark committed
    assert(Ingest.readWatermark(spark, s"$root/raw/metadata/last_run",
      7, java.time.Instant.parse("2030-01-01T00:00:00Z"))
      != "2029-12-25T00:00:00Z")
    // incremental pull: the visitors fetch received the watermark read
    // at run start (first run → the 7-day lookback default), nb02:247
    assert(sinceSeen("visitors").isDefined)
    assert(sinceSeen("media").isEmpty) // catalog always pulled in full
  }

  test("ingest holds the watermark when a fetch exhausts its retries") {
    val root = Files.createTempDirectory("graft_pipe_dirty").toString
    val conf = Pipeline.Conf(s"$root/raw", s"$root/silver",
      mediaIds = Seq("ok1", "bad2"), retrySleep = _ => ())
    val flaky = new Ingest.Fetcher {
      def fetchPage(id: String, endpoint: String, page: Int,
                    since: Option[String]): Option[String] =
        if (id == "bad2" && endpoint == "visitors")
          throw new Ingest.RateLimited // perma-throttled → exhausts retries
        else if (page > 1) None
        else Some(s"""{"hashed_id":"$id","name":"v","created":1700000000}""")
    }
    val runTs = java.time.Instant.parse("2024-06-08T00:00:00Z")
    val clean = Pipeline.ingest(spark, conf, flaky, runTs)
    assert(!clean)
    // watermark did NOT advance to runTs: readWatermark still returns
    // the lookback default, so the next run re-requests the window
    assert(Ingest.readWatermark(spark, s"$root/raw/metadata/last_run",
      7, runTs) == "2024-06-01T00:00:00Z")
    // the clean id's bronze still landed (partial progress preserved)
    assert(graft.sources.Sources.listDir(spark, s"$root/raw/media")
      .exists(_.contains("ok1_")))
    // a subsequent clean run commits
    val ok = new Ingest.Fetcher {
      def fetchPage(id: String, endpoint: String, page: Int,
                    since: Option[String]): Option[String] =
        if (page > 1) None
        else Some(s"""{"hashed_id":"$id","name":"v","created":1700000000}""")
    }
    assert(Pipeline.ingest(spark, conf, ok, runTs))
    assert(Ingest.readWatermark(spark, s"$root/raw/metadata/last_run",
      7, runTs) == "2024-06-08T00:00:00Z")
  }

  test("observedValidation collects DQ metrics as a write side-effect") {
    import spark.implicits._
    val df = Seq(("a", 1), ("", 2), (null, 3)).toDF("k", "v")
    val (observed, obs) = graft.etl.Quality.observedValidation(df,
      "dq_" + System.nanoTime(), Seq("k"))
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("total_rows") == 3L)
    assert(m("k_null_or_empty") == 2L)
  }
}
