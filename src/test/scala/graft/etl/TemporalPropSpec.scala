package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property check for batch sessionization on GENERATED event streams
  * (bursts, exact-gap boundaries, singleton users): the session
  * partition must satisfy the defining invariants — consecutive
  * events inside a session are ≤ gap apart, session boundaries are
  * > gap apart, sessions partition the events exactly, and ids are
  * dense from 0 per user. Batched: all generated users ride one
  * DataFrame, one sessionize call. */
class TemporalPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessionizeBatch invariants on generated streams") {
    val gap = 1800L * 1000000L
    val deltaGen = Gen.oneOf(
      Gen.chooseNum(1L, gap),            // in-session (<= gap)
      Gen.const(gap),                    // exactly gap: SAME session
      Gen.const(gap + 1),                // exactly gap+1: NEW session
      Gen.chooseNum(gap + 1, 10 * gap))  // clear break
    val userGen = Gen.listOfN(40, Gen.nonEmptyListOf(deltaGen)
      .map(_.take(30)))
    val users = userGen.pureApply(Gen.Parameters.default, Seed(5L))
    val rows = users.zipWithIndex.flatMap { case (deltas, u) =>
      deltas.scanLeft(0L)(_ + _).zipWithIndex.map { case (ts, i) =>
        (u.toLong, ts, (i + 1).toLong) }
    }
    val df = rows.toDF("user_id", "ts_us", "event_id")
    val sess = Temporal.sessionizeBatch(df, "user_id", "ts_us",
      "event_id")
    val got = sess.collect().map(r => (
      r.getLong(r.fieldIndex("user_id")),
      r.getLong(r.fieldIndex("session_id")),
      r.getLong(r.fieldIndex("n_events")),
      r.getLong(r.fieldIndex("session_start_us")),
      r.getLong(r.fieldIndex("session_end_us"))))
    // reference implementation in plain Scala
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List(List(ts.head))) {
        case (acc @ cur :: rest, t) =>
          if (t - cur.head > gap) List(t) :: acc
          else (t :: cur) :: rest
        case (Nil, t) => List(List(t))
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        (u, i.toLong, s.size.toLong, s.head, s.last) }
    }
    assert(got.toSet == want.toSet,
      s"missing=${(want.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- want.toSet).take(3)}")
    // partition property: every event in exactly one session
    assert(got.map(_._3).sum == rows.size)
  }
}
