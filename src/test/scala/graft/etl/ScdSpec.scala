package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snapshot() = Seq(
    // key, segment, valid_from, valid_to, is_current
    (1L, "A", "2024-01-01", null, true),
    (2L, "B", "2024-01-01", null, true),
    // key 3 already has history: closed v1 + open v2
    (3L, "C", "2024-01-01", "2024-03-01", false),
    (3L, "D", "2024-03-01", null, true))
    .toDF("key", "segment", "valid_from", "valid_to", "is_current")
    .select(col("key"), col("segment"),
      to_date(col("valid_from")).as("valid_from"),
      to_date(col("valid_to")).as("valid_to"), col("is_current"))

  private val eff = to_date(lit("2024-06-01"))

  test("scd2Merge: change closes the old version and opens a new one") {
    val updates = Seq((1L, "A2"), (2L, "B")).toDF("key", "segment")
    val out = Scd.scd2Merge(snapshot(), updates, "key", Seq("segment"), eff)
      .orderBy("key", "valid_from").collect()
    // key 1 changed: closed old + new current
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.length == 2)
    assert(k1.head.getAs[String]("segment") == "A" &&
      !k1.head.getAs[Boolean]("is_current") &&
      k1.head.getAs[java.sql.Date]("valid_to").toString == "2024-06-01")
    assert(k1.last.getAs[String]("segment") == "A2" &&
      k1.last.getAs[Boolean]("is_current") &&
      k1.last.getAs[java.sql.Date]("valid_to") == null)
    // key 2 unchanged: passes through as-is
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2.head.getAs[Boolean]("is_current"))
    // key 3 untouched by updates: history AND current pass through
    val k3 = out.filter(_.getLong(0) == 3L)
    assert(k3.length == 2)
    assert(k3.count(_.getAs[Boolean]("is_current")) == 1)
  }

  test("scd2Merge: a brand-new key opens a first current version") {
    val updates = Seq((9L, "Z")).toDF("key", "segment")
    val out = Scd.scd2Merge(snapshot(), updates, "key", Seq("segment"), eff)
    val k9 = out.filter(col("key") === 9L).collect()
    assert(k9.length == 1)
    assert(k9.head.getAs[Boolean]("is_current") &&
      k9.head.getAs[java.sql.Date]("valid_from").toString == "2024-06-01")
  }

  test("scd2Merge: a brand-new key with ALL-NULL attributes still opens " +
    "a first current version (presence marker, not attribute diffs)") {
    val updates = Seq((9L, Option.empty[String])).toDF("key", "segment")
    val out = Scd.scd2Merge(snapshot(), updates, "key", Seq("segment"), eff)
    val k9 = out.filter(col("key") === 9L).collect()
    assert(k9.length == 1, "the all-NULL new key must not be dropped")
    assert(k9.head.getAs[Boolean]("is_current") &&
      k9.head.getAs[String]("segment") == null &&
      k9.head.getAs[java.sql.Date]("valid_from").toString == "2024-06-01")
    // and replaying it is still a no-op (NULL <=> NULL on a now-live key)
    val twice = Scd.scd2Merge(out, updates, "key", Seq("segment"), eff)
    assert(twice.count() == out.count())
  }

  test("scd2Merge: NULL attribute transitions count as changes") {
    val cur = Seq((1L, Option("A"))).toDF("key", "segment")
      .withColumn("valid_from", to_date(lit("2024-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val updates = Seq((1L, Option.empty[String])).toDF("key", "segment")
    val out = Scd.scd2Merge(cur, updates, "key", Seq("segment"), eff)
    assert(out.count() == 2) // A closed out, NULL version opened
    assert(out.filter(col("is_current") && col("segment").isNull)
      .count() == 1)
  }

  test("scd2Merge: replaying the same batch is a no-op") {
    val updates = Seq((1L, "A2")).toDF("key", "segment")
    val once = Scd.scd2Merge(snapshot(), updates, "key", Seq("segment"), eff)
    val twice = Scd.scd2Merge(once, updates, "key", Seq("segment"), eff)
    assert(twice.count() == once.count())
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }
}
