package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 100L), (1L, 250L), (1L, 900L), (2L, 250L), (3L, 50L))
    .toDF("user", "t")
  private lazy val intervals = Seq(
    (1L, 100L, 300L),  // catches t=100 (inclusive lo) and 250
    (1L, 900L, 900L),  // empty: hi == lo, must match nothing
    (2L, 0L, 250L),    // t=250 NOT caught (exclusive hi)
    (2L, 200L, 260L),  // t=250 caught
    (4L, 0L, 1000L))   // no points for this user
    .toDF("user", "lo", "hi")

  test("bucketed equals the brute-force range join, boundary semantics") {
    val got = IntervalJoin.bucketed(points, "t", intervals, "lo", "hi",
      bucketWidth = 128, keys = Seq("user"))
      .select("user", "t", "lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val brute = points.as("p")
      .join(intervals.as("i"), col("p.user") === col("i.user") &&
        col("t") >= col("lo") && col("t") < col("hi"))
      .select(col("p.user"), col("t"), col("lo"), col("hi")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == brute)
    assert(got == Set((1L, 100L, 100L, 300L), (1L, 250L, 100L, 300L),
      (2L, 250L, 200L, 260L)))
  }

  test("bucketed is an equi-join in the plan, not a nested loop") {
    val plan = IntervalJoin.bucketed(points, "t", intervals, "lo", "hi",
      bucketWidth = 128, keys = Seq("user"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("property: bucketed == brute force on seeded random data") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val pts = List.fill(300)((rnd.nextInt(5).toLong,
        rnd.nextInt(10000).toLong)).toDF("user", "t")
      val ivs = List.fill(60) {
        val lo = rnd.nextInt(10000).toLong
        (rnd.nextInt(5).toLong, lo, lo + rnd.nextInt(2000).toLong)
      }.toDF("user", "lo", "hi")
      // bucket width deliberately mismatched to interval lengths
      val width = 1 + rnd.nextInt(3000)
      val got = IntervalJoin.bucketed(pts, "t", ivs, "lo", "hi",
        bucketWidth = width, keys = Seq("user"))
        .groupBy().count().head.getLong(0)
      val brute = pts.as("p").join(ivs.as("i"),
        col("p.user") === col("i.user") &&
          col("t") >= col("lo") && col("t") < col("hi")).count()
      assert(got == brute, s"seed=$seed width=$width")
    }
  }

  test("an open-ended sentinel interval fails fast with an actionable " +
    "error instead of exploding a giant sequence") {
    val pts = Seq((1L, 100L)).toDF("user", "t")
    val iv = Seq((1L, 0L, Long.MaxValue)).toDF("user", "lo", "hi")
    val e = intercept[Exception] {
      IntervalJoin.bucketed(pts, "t", iv, "lo", "hi",
        bucketWidth = 1000, keys = Seq("user")).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("IntervalJoin.bucketed")),
      s"error must name the operator and the fix: $e")
    // a tight custom limit trips too; a generous one admits the row
    val small = Seq((1L, 0L, 10000L)).toDF("user", "lo", "hi")
    intercept[Exception] {
      IntervalJoin.bucketed(pts, "t", small, "lo", "hi",
        bucketWidth = 10, keys = Seq("user"),
        maxBucketsPerInterval = 100).count()
    }
    assert(IntervalJoin.bucketed(pts, "t", small, "lo", "hi",
      bucketWidth = 10, keys = Seq("user"),
      maxBucketsPerInterval = 2000).count() == 1)
  }

  test("an interval spanning many buckets still matches every point") {
    val pts = (0L until 1000L by 10).map(t => (1L, t)).toDF("user", "t")
    val iv = Seq((1L, 5L, 995L)).toDF("user", "lo", "hi")
    val n = IntervalJoin.bucketed(pts, "t", iv, "lo", "hi",
      bucketWidth = 7, keys = Seq("user")).count()
    // t in {10,20,...,990}: 99 points inside [5, 995)
    assert(n == 99)
  }
}
