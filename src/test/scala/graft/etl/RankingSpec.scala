package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic data with heavy ties and n_total % n != 0. */
  private lazy val df = (1 to 103)
    .map(i => (i.toLong, (i * 37 % 11).toLong))
    .toDF("id", "v")

  test("ntileByValue equals the window NTILE exactly, ties included") {
    val w = Window.orderBy(col("v"), col("id"))
    val expect = df.withColumn("nt", ntile(7).over(w))
      .select("id", "nt").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ranking.ntileByValue(df, "v", "id", 7)
      .select("id", "ntile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expect)
  }

  test("ntileByValue: fewer rows than buckets matches NTILE") {
    val tiny = Seq((1L, 5L), (2L, 5L), (3L, 1L)).toDF("id", "v")
    val w = Window.orderBy(col("v"), col("id"))
    val expect = tiny.withColumn("nt", ntile(10).over(w))
      .select("id", "nt").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ranking.ntileByValue(tiny, "v", "id", 10)
      .select("id", "ntile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expect)
  }

  test("the full-data window is partitioned by value, not global") {
    val plan = Ranking.ntileByValue(df, "v", "id", 7)
      .queryExecution.executedPlan.toString
    // the row_number over the full relation must carry a partition spec
    // (partitionSpec prints between the function list and the order spec)
    val rnWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number"))
      .toSeq
    assert(rnWindows.nonEmpty)
    assert(rnWindows.forall(_.contains("windowspecdefinition(v#")),
      s"row_number window lost its partition-by-value spec:\n$plan")
  }
}
