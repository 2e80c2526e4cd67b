package graft.etl

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Silver transforms against reference-shaped bronze fixtures
  * (FIXTURES.md §A1/A2): JSON files under directory names that carry
  * the media-id lineage, exercising both regexp patterns. */
class TransformsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeFixture(): Path = {
    val root = Files.createTempDirectory("graft_fixture")
    def put(rel: String, lines: Seq[String]): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, lines.mkString("\n"))
    }
    put("media/abc123_20240101_020000/data.json", Seq(
      """{"hashed_id":"abc123","name":"My YouTube Clip","created":1700000000,"duration":12.5}""",
      """{"hashed_id":"def456","name":null,"created":"not_a_number"}""",
      """{"hashed_id":"def456","name":null,"created":"not_a_number"}""",
      """{"hashed_id":"","name":"Facebook promo","created":1700000001}"""))
    put("visitors/abc123_20240101_020000/data.json", Seq(
      """{"visitor_key":"v1","ip_address":"1.2.3.4","country":"DE","events":[{"type":"play","time":1700000000,"duration_watched":"10.5","percent_watched":"50"},{"type":"play","time":1700000100,"duration_watched":"3.5","percent_watched":"30"},{"type":"pause","time":1700000200,"duration_watched":"99","percent_watched":"99"}]}""",
      """{"visitor_key":"v2","ip_address":null,"country":null,"events":[]}""",
      """{"visitor_key":"v3","country":"FR","events":null}"""))
    // matches only the fallback pattern (no _yyyyMMdd_HHmmss suffix)
    put("visitors/zz9_oddname/data.json", Seq(
      """{"visitor_key":"","ip_address":"5.6.7.8","country":"US","events":[{"type":"play","time":1700090000,"duration_watched":null,"percent_watched":null}]}"""))
    root
  }

  private lazy val root = writeFixture()
  private lazy val rawMedia = spark.read.schema(graft.model.Schemas.rawMedia)
    .json(root.resolve("media").toString + "/*/")
  private lazy val rawVisitors = spark.read
    .schema(graft.model.Schemas.rawVisitor)
    .json(root.resolve("visitors").toString + "/*/")

  test("dimMedia: rename, null default, url, channel, cast guard, " +
    "distinct, key backfill") {
    val clock = to_timestamp(lit("2024-06-01 00:00:00"))
    val dm = Transforms.dimMedia(rawMedia, clock).cache()
    assert(dm.count() == 3) // 4 docs, 1 exact duplicate removed
    val byTitle = dm.collect().map(r => r.getAs[String]("title") -> r).toMap
    val yt = byTitle("My YouTube Clip")
    assert(yt.getAs[String]("channel") == "YouTube")
    assert(yt.getAs[String]("url") == Transforms.UrlPrefix + "abc123")
    assert(yt.getAs[java.sql.Timestamp]("created_at").toInstant
      == java.time.Instant.ofEpochSecond(1700000000L))
    val unknown = byTitle("Unknown") // null name → default + Wistia channel
    assert(unknown.getAs[String]("channel") == "Wistia")
    // non-castable created → falls back to the injected clock
    assert(unknown.getAs[java.sql.Timestamp]("created_at").toString
      .startsWith("2024-06-01"))
    val fb = byTitle("Facebook promo") // empty hashed_id → surrogate
    assert(fb.getAs[String]("media_id").startsWith("media_"))
    assert(fb.getAs[String]("channel") == "Facebook")
  }

  test("dimVisitor: defaults + distinct") {
    val dv = Transforms.dimVisitor(rawVisitors,
      to_timestamp(lit("2024-06-01 00:00:00")))
    val rows = dv.collect().map(r =>
      r.getAs[String]("visitor_id") -> (r.getAs[String]("ip_address"),
        r.getAs[String]("country"))).toMap
    assert(rows("v2") == ("Unknown", "Unknown"))
    assert(rows("v1") == ("1.2.3.4", "DE"))
  }

  test("withMediaIdFromPath: primary pattern + fallback pattern") {
    val withId = Transforms.withMediaIdFromPath(rawVisitors)
    val ids = withId.select("visitor_key", "media_id").collect()
      .map(r => Option(r.getString(0)).getOrElse("") -> r.getString(1))
      .toMap
    assert(ids("v1") == "abc123") // primary: /visitors/abc123_20240101_020000/
    assert(ids("") == "zz9")      // fallback: /visitors/zz9_oddname/
  }

  test("factEngagement: explode, play-only filter, grain, play_rate " +
    "quirk, null-safe sums, key backfill") {
    val fact = Transforms.factEngagement(
      Transforms.withMediaIdFromPath(rawVisitors),
      to_timestamp(lit("2024-06-01 00:00:00"))).cache()
    // v2 (empty events) and v3 (null events) contribute nothing
    assert(fact.count() == 2)
    val v1 = fact.filter(col("visitor_id") === "v1").collect().head
    assert(v1.getAs[String]("media_id") == "abc123")
    assert(v1.getAs[Long]("play_count") == 2) // pause event excluded
    assert(v1.getAs[Double]("play_rate") == 0.2) // count/10.0, verbatim quirk
    assert(v1.getAs[Double]("total_watch_time_seconds") == 14.0)
    assert(v1.getAs[Double]("avg_percent_watched") == 40.0)
    // empty visitor_key → surrogate; null duration/percent → 0.0
    val zz = fact.filter(col("media_id") === "zz9").collect().head
    assert(zz.getAs[String]("visitor_id").startsWith("visitor_"))
    assert(zz.getAs[Double]("total_watch_time_seconds") == 0.0)
  }

  test("goldCastFact: ADF narrowing — renames + int/decimal downcasts") {
    val fact = Transforms.factEngagement(
      Transforms.withMediaIdFromPath(rawVisitors),
      to_timestamp(lit("2024-06-01 00:00:00")))
    val gold = Transforms.goldCastFact(fact)
    val sch = gold.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("total_watch_time") == "int")
    assert(sch("watched_percent") == "decimal(5,2)")
    assert(sch("play_rate") == "decimal(5,2)")
    assert(sch("play_count") == "int")
    assert(!gold.columns.contains("total_watch_time_seconds"))
  }
}
