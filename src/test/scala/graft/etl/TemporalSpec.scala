package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoinBackward: latest-at-or-before, ties, and no-match null") {
    val trades = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("user", "ts", "trade_id")
    val quotes = Seq((1L, 100L, 901L), (1L, 150L, 902L), (1L, 90L, 900L))
      .toDF("user", "ts", "quote_id")
    val out = Temporal.asofJoinBackward(trades, quotes, "user", "ts",
      "quote_id", "asof_quote")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("asof_quote"))).toMap
    assert(out(10L).contains(901L)) // quote AT the trade ts matches
    assert(out(11L).contains(902L)) // latest preceding
    assert(out(12L).isEmpty)        // user 2 has no quotes → null
  }

  test("sessionizeBatch: gap strictly-greater splits, counts per session") {
    val ev = Seq(
      (1L, 0L, 1L), (1L, 1800000000L, 2L),  // exactly gap apart: SAME
      (1L, 3600000001L, 3L),                 // gap+1 later: NEW session
      (2L, 0L, 4L))
      .toDF("user", "ts_us", "event_id")
    val out = Temporal.sessionizeBatch(ev, "user", "ts_us", "event_id")
      .collect().map(r => (r.getAs[Long]("user"),
        r.getAs[Long]("session_id")) -> r.getAs[Long]("n_events")).toMap
    assert(out((1L, 0L)) == 2L)
    assert(out((1L, 1L)) == 1L)
    assert(out((2L, 0L)) == 1L)
  }

  test("interpolateLinear: midpoint fill, edge gaps stay null, keys isolated") {
    val ev = Seq(
      (1L, 0L, Some(10.0), 1L),
      (1L, 10L, None, 2L),        // 10/40 of the way 10.0 → 50.0
      (1L, 40L, Some(50.0), 3L),
      (1L, 50L, None, 4L),        // trailing gap: no next → null
      (2L, 0L, None, 5L),         // leading gap: no prev → null
      (2L, 5L, Some(7.0), 6L))
      .toDF("user", "ts_us", "value", "event_id")
    val out = Temporal.interpolateLinear(ev, "user", "ts_us", "value",
        "event_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("value_interp"))).toMap
    assert(out(1L).contains(10.0)) // non-null passes through
    assert(out(2L).contains(10.0 + 40.0 * (10.0 / 40.0))) // = 20.0
    assert(out(3L).contains(50.0))
    assert(out(4L).isEmpty)
    assert(out(5L).isEmpty) // user 2's values never bleed from user 1
    assert(out(6L).contains(7.0))
  }
}
