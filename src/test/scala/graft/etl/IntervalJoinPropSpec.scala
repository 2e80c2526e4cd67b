package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property check for the bucketed interval join: on GENERATED random
  * instances (points, intervals, bucket widths — including the edge
  * cases hand-written specs under-sample: empty intervals, intervals
  * ending exactly on bucket boundaries, width larger than the whole
  * domain), the equi-join reformulation must produce EXACTLY the
  * brute-force `lo <= t < hi` pair set. One Spark job per width, all
  * generated rows in one DataFrame — the scalacheck generation is
  * batched so the property costs 3 jobs, not 300. */
class IntervalJoinPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed() == brute force on generated instances, across widths") {
    val pGen = Gen.listOfN(300, Gen.chooseNum(0L, 5000L))
    val iGen = Gen.listOfN(120, for {
      lo <- Gen.chooseNum(0L, 5000L)
      len <- Gen.oneOf(Gen.const(0L), Gen.chooseNum(1L, 400L),
        Gen.oneOf(100L, 128L, 4096L)) // empty, general, boundary-prone
    } yield (lo, lo + len))
    val seed = Seed(7L)
    val pts = pGen.pureApply(Gen.Parameters.default, seed)
    val ivs = iGen.pureApply(Gen.Parameters.default, seed.next)

    val points = pts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
    val intervals = ivs.zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iid", "lo", "hi")

    val expected = points.join(intervals,
        col("t") >= col("lo") && col("t") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

    Seq(1L, 128L, 10000L).foreach { width =>
      val got = IntervalJoin.bucketed(points, "t", intervals, "lo", "hi",
          bucketWidth = width)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"width=$width: ${got.size} pairs vs ${expected.size}; " +
          s"missing=${(expected -- got).take(5)} " +
          s"extra=${(got -- expected).take(5)}")
    }
  }
}
