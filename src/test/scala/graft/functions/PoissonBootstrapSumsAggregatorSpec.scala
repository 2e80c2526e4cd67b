package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PoissonBootstrapSumsAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The frozen SQL weight scheme the oracle replays — computed here
    * through Spark's own md5/conv/substring, then compared lane-by-
    * lane against the aggregator's JVM derivation. If these ever
    * diverge, the stats_bootstrap_ci oracle hash breaks. */
  private def sqlSums(rows: Seq[(Long, String)], b: Int)
  : (Seq[Long], Seq[Long]) = {
    val df = rows.toDF("c", "key")
      .select(col("c"), col("key"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
    val u32 = conv(substring(md5(concat(lit("b:"),
      col("rep").cast("string"), lit(":"), col("key"))), 1, 8), 16, 10)
      .cast("long")
    val w = when(u32 < 1580030168L, 0L)
      .when(u32 < 3160060337L, 1L)
      .when(u32 < 3950075421L, 2L)
      .otherwise(3L)
    val m = df.select(col("rep"), col("c"), w.as("w"))
      .groupBy("rep")
      .agg(sum(col("w") * col("c")).as("swx"), sum(col("w")).as("sw"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    (Seq.tabulate(b)(r => m(r)._1), Seq.tabulate(b)(r => m(r)._2))
  }

  test("JVM weight derivation is bit-identical to the SQL md5 scheme") {
    val b = 16
    val rows = Seq(1234L -> "evt_1", 500L -> "evt_2", 99L -> "x",
      700L -> "evt_1000000007", 1L -> "")
    val (expSwx, expSw) = sqlSums(rows, b)
    val got = rows.toDS()
      .select(PoissonBootstrapSumsAggregator(b).toColumn.name("s"))
      .collect().head
    assert(got._1 == expSwx)
    assert(got._2 == expSw)
  }

  test("partial-merge path: many partitions, same sums") {
    val b = 8
    val rows = (1 to 500).map(i => (i.toLong, s"evt_$i"))
    val (expSwx, expSw) = sqlSums(rows, b)
    val got = spark.createDataset(rows).repartition(13)
      .select(PoissonBootstrapSumsAggregator(b).toColumn.name("s"))
      .collect().head
    assert(got._1 == expSwx)
    assert(got._2 == expSw)
  }

  test("empty input finishes with zero lanes (null replica means downstream)") {
    val got = Seq.empty[(Long, String)].toDS()
      .select(PoissonBootstrapSumsAggregator(4).toColumn.name("s"))
      .collect().head
    assert(got._1 == Seq(0L, 0L, 0L, 0L))
    assert(got._2 == Seq(0L, 0L, 0L, 0L))
  }
}
