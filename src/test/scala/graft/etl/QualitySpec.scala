package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    ("a", "x", 1), ("a", "x", 2), ("a", "y", 3),
    ("", "z", 4), (null, "z", 5), ("b", null, 6)
  ).toDF("k1", "k2", "v")

  test("validateKeys: one-pass null/empty counts") {
    val m = Quality.validateKeys(df, Seq("k1", "k2")).collect().head
    assert(m.getAs[Long]("total_rows") == 6)
    assert(m.getAs[Long]("k1_null_or_empty") == 2)
    assert(m.getAs[Long]("k2_null_or_empty") == 1)
  }

  test("filterValidKeys drops any null/empty key row") {
    assert(Quality.filterValidKeys(df, Seq("k1", "k2")).count() == 3)
  }

  test("duplicateGroups finds only groups with >1 row") {
    val d = Quality.duplicateGroups(df, Seq("k1", "k2")).collect()
    assert(d.length == 1)
    assert(d.head.getAs[String]("k1") == "a")
    assert(d.head.getAs[Long]("dup_count") == 2)
  }

  test("dedupByKeys keeps the deterministic first row per key group") {
    val out = Quality.dedupByKeys(df, Seq("k1", "k2"), Seq(col("v")))
    val kept = out.filter(col("k1") === "a" && col("k2") === "x").collect()
    assert(kept.length == 1 && kept.head.getAs[Int]("v") == 1)
    assert(out.count() == 5)
  }

  test("property: dedup is idempotent and grain-unique (seeded random)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val ks = Array("a", "b", "c"); val k2s = Array("x", "y")
      val rs = List.fill(60)((ks(rnd.nextInt(3)), k2s(rnd.nextInt(2)),
        rnd.nextInt(100)))
      val d = rs.toDF("k1", "k2", "v")
      val order = Seq(col("v"), col("k1"))
      val once = Quality.dedupByKeys(d, Seq("k1", "k2"), order)
      val twice = Quality.dedupByKeys(once, Seq("k1", "k2"), order)
      val n1 = once.count()
      assert(n1 == twice.count())
      assert(n1 == once.select("k1", "k2").distinct().count())
    }
  }

  test("qualityReport: exact + approx distinct in one pass") {
    val m = Quality.qualityReport(df, Seq("k1", "k2")).collect().head
    assert(m.getAs[Long]("total_rows") == 6)
    assert(m.getAs[Long]("distinct_keys") == 5)
    assert(m.getAs[Long]("approx_distinct_keys") >= 4)
  }

  test("checkExpectations: one pass, NULL rule results are violations") {
    val d = Seq((1, Some(10)), (2, Some(-5)), (3, None))
      .toDF("id", "score")
    val m = Quality.checkExpectations(d, Seq(
      Quality.Expectation("score_positive", col("score") > 0),
      Quality.Expectation("id_present", col("id").isNotNull)))
      .collect().head
    assert(m.getAs[Long]("total_rows") == 3)
    // -5 fails outright; NULL score cannot satisfy the rule → 2
    assert(m.getAs[Long]("score_positive") == 2)
    assert(m.getAs[Long]("id_present") == 0)
  }

  test("quarantine: exact split, multi-reason rows, NULL = failure") {
    val d = Seq((1, Some(10), "ok"), (2, Some(-5), "ok"),
      (3, None, "bad"), (4, Some(300), "ok"))
      .toDF("id", "score", "status")
    val (valid, bad) = Quality.quarantine(d, Seq(
      Quality.Expectation("score_positive", col("score") > 0),
      Quality.Expectation("score_below_cap", col("score") < 100),
      Quality.Expectation("status_ok", col("status") === "ok")))
    assert(valid.select("id").as[Int].collect().toSeq == Seq(1))
    assert(!valid.columns.contains("_errors"))
    val reasons = bad.select("id", "_errors").as[(Int, String)]
      .collect().toMap
    assert(reasons(2) == "score_positive")
    // NULL score fails BOTH score rules, in declaration order
    assert(reasons(3) == "score_positive,score_below_cap,status_ok")
    assert(reasons(4) == "score_below_cap")
    // split is a partition: every input row lands on exactly one side
    assert(valid.count() + bad.count() == d.count())
  }
}
