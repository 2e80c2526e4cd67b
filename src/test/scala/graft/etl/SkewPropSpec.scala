package graft.etl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property check for the salted join: on GENERATED skew shapes (one
  * dominant hot key, missing keys on either side, duplicate small-side
  * payloads) and salt factors, `saltedJoin` must return EXACTLY the
  * multiset a plain inner key join returns — salting redistributes
  * work, never rows. */
class SkewPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin == plain join on generated skew, across salt factors") {
    val largeGen = Gen.listOfN(400, for {
      k <- Gen.frequency(6 -> Gen.const(7L), // hot key
        3 -> Gen.chooseNum(0L, 20L),
        1 -> Gen.const(99L)) // key absent from small side
      v <- Gen.chooseNum(0L, 1000000L)
    } yield (k, v))
    val smallGen = Gen.listOfN(30, for {
      k <- Gen.chooseNum(0L, 25L) // some keys absent from large side
      p <- Gen.chooseNum(0L, 9L)
    } yield (k, p))
    val large = largeGen.pureApply(Gen.Parameters.default, Seed(31L))
      .toDF("key", "v")
    val small = smallGen.pureApply(Gen.Parameters.default, Seed(32L))
      .toDF("key", "p")
    val want = large.join(small, Seq("key")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    Seq(1, 4, 16).foreach { sf =>
      val got = Skew.saltedJoin(large, small, "key", saltFactor = sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == want, s"saltFactor=$sf changed the join multiset")
    }
  }
}
