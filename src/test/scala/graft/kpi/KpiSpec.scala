package graft.kpi

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KpiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (media, visitor, date, play_count, pct, seconds)
  private lazy val fact = Seq(
    ("m1", "v1", "2024-01-01", 2L, 50.0, 100.0),
    ("m1", "v2", "2024-01-01", 1L, 80.0, 200.0),
    ("m2", "v1", "2024-01-02", 3L, 20.0, 3600.0),
    ("m2", "v2", "2024-01-02", 4L, 60.0, 100.0)
  ).toDF("media_id", "visitor_id", "date", "play_count",
    "avg_percent_watched", "total_watch_time_seconds")

  private lazy val dimMedia = Seq(
    ("m1", "Video One", "YouTube"), ("m2", "Video Two", "Wistia")
  ).toDF("media_id", "title", "channel")

  private lazy val dimVisitor = Seq(
    ("v1", "DE"), ("v2", "US")
  ).toDF("visitor_id", "country")

  test("K1 total plays") {
    assert(Kpi.totalPlays(fact, "play_count").collect().head
      .getAs[Double]("total_plays") == 10.0)
  }

  test("K2 avg completion") {
    assert(Kpi.avgCompletion(fact, "avg_percent_watched").collect().head
      .getAs[Double]("avg_completion") == 52.5)
  }

  test("K3 watch hours") {
    assert(Kpi.totalWatchHours(fact, "total_watch_time_seconds")
      .collect().head.getAs[Double]("total_watch_hours") == 4000.0 / 3600.0)
  }

  test("K4 engagement rate = plays / distinct visitors") {
    assert(Kpi.engagementRate(fact, "play_count", "visitor_id")
      .collect().head.getAs[Double]("engagement_rate") == 5.0)
  }

  test("K5 videos by channel") {
    val m = Kpi.videosByChannel(dimMedia, "channel").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("YouTube" -> 1L, "Wistia" -> 1L))
  }

  test("K6 daily trend is date-ordered") {
    val rows = Kpi.dailyTrend(fact, "date", "play_count").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("2024-01-01", "2024-01-02"))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(3.0, 7.0))
  }

  test("K7/K8 video performance + top-N uses a broadcast join") {
    val perf = Kpi.videoPerformance(fact, dimMedia, "media_id", "title",
      "play_count", "avg_percent_watched", "total_watch_time_seconds")
    val plan = perf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
    val top = Kpi.topVideos(perf, 1).collect()
    assert(top.head.getAs[String]("title") == "Video Two") // 7 plays
  }

  test("K9 by country") {
    val rows = Kpi.byCountry(fact, dimVisitor, "visitor_id", "country",
      "play_count", "visitor_id").collect()
      .map(r => r.getAs[String]("country") ->
        (r.getAs[Double]("total_plays"), r.getAs[Long]("unique_visitors")))
      .toMap
    assert(rows("DE") == (5.0, 1L))
    assert(rows("US") == (5.0, 1L))
  }

  test("K10 new vs returning: first-seen split") {
    val rows = Kpi.newVsReturning(fact, "visitor_id", "date").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // both visitors first seen on 01-01, both returning on 01-02
    assert(rows(("2024-01-01", 1)) == 2L)
    assert(rows(("2024-01-02", 0)) == 2L)
    assert(!rows.contains(("2024-01-02", 1)))
  }

  test("K11 unique visitors") {
    assert(Kpi.uniqueVisitors(fact, "visitor_id").collect().head
      .getLong(0) == 2L)
  }
}
