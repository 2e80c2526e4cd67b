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

  test("ntileByValue ranks NULL order values first, like window NTILE") {
    val withNulls = Seq(
      (1L, Option(5L)), (2L, Option.empty[Long]), (3L, Option(1L)),
      (4L, Option.empty[Long]), (5L, Option(5L)), (6L, Option(1L)))
      .toDF("id", "v")
    val w = Window.orderBy(col("v").asc_nulls_first, col("id"))
    val expect = withNulls.withColumn("nt", ntile(3).over(w))
      .select("id", "nt").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ranking.ntileByValue(withNulls, "v", "id", 3)
      .select("id", "ntile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expect) // the null-safe <=> join keeps the null group
  }

  test("ntileApprox: continuous domain, zero windows, all rows bucketed") {
    // near-unique values: distinct ≈ rows, the case where ntileByValue's
    // bounded-domain precondition fails and the CDF window degenerates
    val cont = (1 to 5000).map(i => (i.toLong, i * 0.000317 + 1.0 / i))
      .toDF("id", "v")
    val res = Ranking.ntileApprox(cont, "v", 10)
    assert(!res.queryExecution.executedPlan.toString.contains("Window"))
    val counts = res.groupBy("ntile").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000L)
    assert(counts.keySet == (1 to 10).toSet)
    // approx boundaries keep buckets near-balanced (±30% here)
    assert(counts.values.forall(c => c > 350 && c < 650), counts)
    // assignment is monotone in v by construction: max(v) of bucket i
    // never exceeds min(v) of bucket i+1
    val edges = res.groupBy("ntile").agg(min("v").as("mn"), max("v").as("mx"))
      .orderBy("ntile").collect()
    edges.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) <= b.getDouble(1))
    case _ => ()
    }
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
