package graft.sources.v2

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable
import graft.TestSpark

/** The DataSourceV2 metadata connector: short-name registration,
  * version/file/stats fidelity against the manifest API, SQL-surface
  * usability, and the required-option error. */
class ManifestMetaSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkTable(): String = {
    val t = java.nio.file.Files
      .createTempDirectory("graft_dsv2").toString + "/t"
    ManifestTable.commitAppend(spark, t, (1L to 20L).toDF("id"),
      statsCol = Some("id"))                       // v1, with stats
    ManifestTable.commitAppend(spark, t, (21L to 40L).toDF("id")) // v2
    t
  }

  test("serves every manifest version's entries with stats fidelity") {
    val t = mkTable()
    val meta = spark.read.format("graft-manifest-meta")
      .option("path", t).load()
    val got = meta.select("version", "file", "stats_column",
        "stats_min", "stats_max")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    // truth straight from the manifest API
    val want = (1L to ManifestTable.latestVersion(spark, t)).flatMap {
      v => ManifestTable.allEntries(spark, t).filter(_._1 == v)
    }.map { case (v, f, st) =>
      (v, f, st.map(_._1), st.map(_._2), st.map(_._3)) }.toSet
    assert(got == want)
    // v2 references v1's files too (append semantics) — the meta table
    // must show file lineage growing, with stats only where committed
    assert(meta.filter(col("version") === 2).count() >
      meta.filter(col("version") === 1).count())
    assert(meta.filter(col("version") === 1 &&
      col("stats_min").isNotNull).count() > 0)
  }

  test("usable as a plain SQL table (the point of a connector)") {
    val t = mkTable()
    spark.read.format("graft-manifest-meta").option("path", t).load()
      .createOrReplaceTempView("mmeta")
    val perVersion = spark.sql(
      "SELECT version, COUNT(*) AS files FROM mmeta GROUP BY version" +
        " ORDER BY version").collect()
    assert(perVersion.length == 2)
    assert(perVersion(0).getLong(1) < perVersion(1).getLong(1))
  }

  test("version filter pushes down: whole partitions pruned at planning") {
    val t = mkTable()
    val meta = spark.read.format("graft-manifest-meta")
      .option("path", t).load()
    // unfiltered: one input partition per version
    assert(meta.rdd.getNumPartitions == 2)
    val only2 = meta.filter(col("version") === 2L)
    assert(only2.rdd.getNumPartitions == 1,
      "EqualTo(version) must prune the v1 partition at planning")
    // semantics unchanged (all filters stay residual)
    assert(only2.select("version").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    val upTo1 = meta.filter(col("version") <= 1L)
    assert(upTo1.rdd.getNumPartitions == 1)
    assert(upTo1.count() == meta.filter(col("version") === 1L).count())
  }

  test("missing path option fails with the documented message") {
    val e = intercept[Exception](
      spark.read.format("graft-manifest-meta").load())
    assert(e.getMessage.contains("path"), e.getMessage)
  }
}
