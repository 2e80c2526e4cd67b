package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property check for the CDF-reconstruction NTILE: on GENERATED
  * value distributions (heavy ties, skew, nulls, n larger than the
  * row count), `ntileByValue` must agree ROW-FOR-ROW with Spark's
  * own window `ntile` under the identical total order — the window
  * formulation is the semantic reference, the CDF formulation is the
  * scale-safe plan, and the property pins their equivalence beyond
  * the hand-written cases. Batched: every generated distribution in
  * one DataFrame, one comparison join per n. */
class RankingPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ntileByValue == window ntile on generated distributions") {
    val valueGen: Gen[Option[Int]] = Gen.frequency(
      5 -> Gen.chooseNum(0, 8).map(Some(_)),   // heavy ties
      3 -> Gen.chooseNum(0, 10000).map(Some(_)), // spread
      1 -> Gen.const(Option.empty[Int]))        // nulls rank first
    val rowsGen = Gen.listOfN(500, valueGen)
    val vals = rowsGen.pureApply(Gen.Parameters.default, Seed(21L))
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

    Seq(1, 4, 10, 777).foreach { n => // incl. n >> distinct and n >> rows/ntile
      val got = Ranking.ntileByValue(df, "v", "id", n)
        .select(col("id"), col("ntile").as("got"))
      val want = df.withColumn("want",
        ntile(n).over(Window.orderBy(col("v"), col("id"))))
        .select(col("id"), col("want"))
      val diff = got.join(want, Seq("id"))
        .filter(col("got") =!= col("want")).count()
      assert(diff == 0, s"n=$n: $diff rows disagree with window ntile")
    }
  }
}
