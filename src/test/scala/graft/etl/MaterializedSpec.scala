package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The partial-aggregate merge contract behind `mv_incremental_daily`:
  * merging per-split partials in ANY grouping/order reproduces the
  * one-shot aggregate — the property that makes delta-only view
  * refresh safe. */
class MaterializedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def partials(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("s"))

  private lazy val rows = (1 to 300).map(i => (i % 7, i * 1.25))
  private lazy val all = rows.toDF("k", "v")

  test("merge of split partials equals one-shot aggregate, any split") {
    val oneShot = partials(all).orderBy("k").collect().toSeq
    // three-way uneven split, merged left-to-right then right-to-left
    val (a, b, c) = (rows.take(10), rows.slice(10, 250), rows.drop(250))
    def p(xs: Seq[(Int, Double)]) = partials(xs.toDF("k", "v"))
    val ltr = Materialized.mergePartials(
      Materialized.mergePartials(p(a), p(b), Seq("k")), p(c), Seq("k"))
    val rtl = Materialized.mergePartials(
      p(a), Materialized.mergePartials(p(c), p(b), Seq("k")), Seq("k"))
    assert(ltr.orderBy("k").collect().toSeq == oneShot)
    assert(rtl.orderBy("k").collect().toSeq == oneShot)
  }

  test("keys present on only one side survive the merge") {
    val left = partials(Seq((1, 2.0), (2, 3.0)).toDF("k", "v"))
    val right = partials(Seq((2, 1.0), (9, 5.0)).toDF("k", "v"))
    val m = Materialized.mergePartials(left, right, Seq("k"))
      .orderBy("k").collect()
    assert(m.map(_.getInt(0)).toSeq == Seq(1, 2, 9))
    assert(m.map(_.getLong(1)).toSeq == Seq(1L, 2L, 1L))
  }

  test("schema divergence is rejected") {
    val left = partials(Seq((1, 2.0)).toDF("k", "v"))
    val bad = left.withColumnRenamed("s", "total")
    intercept[IllegalArgumentException] {
      Materialized.mergePartials(left, bad, Seq("k"))
    }
  }
}
