package graft.sources.v2

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable
import graft.TestSpark

/** The streaming change-feed connector: additions-only semantics per
  * version, startingVersion, checkpoint-restart exactly-once, and
  * idle behavior on an empty table. */
class ManifestCdcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def drain(path: String, ckpt: String, sink: String,
                    startingVersion: Option[Long] = None): Unit = {
    val reader = spark.readStream.format("graft-manifest-cdc")
      .option("path", path)
    val stream = startingVersion
      .fold(reader)(v => reader.option("startingVersion", v.toString))
      .load()
    val q = stream.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("emits only the files ADDED at each version, with stats") {
    val t = tmp("graft_cdc") + "/t"
    ManifestTable.commitAppend(spark, t, (1L to 20L).toDF("id"),
      statsCol = Some("id"))                            // v1
    ManifestTable.commitAppend(spark, t, (21L to 40L).toDF("id"),
      statsCol = Some("id"))                            // v2
    drain(t, tmp("graft_cdc_ck"), "cdc_add")
    val rows = spark.table("cdc_add")
    // v2's manifest lists v1's files too (append snapshot semantics);
    // the FEED must emit each file exactly once, at its add version.
    assert(rows.select("file").distinct().count() == rows.count())
    val perV = rows.groupBy("version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perV.keySet == Set(1L, 2L))
    // stats ride along: v1's files carry the committed id range
    val v1 = rows.filter(col("version") === 1)
    assert(v1.agg(min("stats_min"), max("stats_max")).head() ==
      org.apache.spark.sql.Row(1L, 20L))
  }

  test("checkpoint restart resumes after the last committed version") {
    // memory sinks don't support checkpoint recovery — the restart
    // contract needs a durable sink, so this test drains to parquet.
    val t = tmp("graft_cdc2") + "/t"
    val ckpt = tmp("graft_cdc2_ck")
    val out = tmp("graft_cdc2_out") + "/feed"
    def drainToFiles(): Unit = {
      val q = spark.readStream.format("graft-manifest-cdc")
        .option("path", t).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    ManifestTable.commitAppend(spark, t, (1L to 10L).toDF("id")) // v1
    drainToFiles()
    val firstDrain = spark.read.parquet(out)
    assert(firstDrain.select("version").distinct()
      .collect().map(_.getLong(0)).toSet == Set(1L))
    val v1Files = firstDrain.count() // v1's file count, emitted once
    // two more commits while the stream is down
    ManifestTable.commitAppend(spark, t, (11L to 20L).toDF("id")) // v2
    ManifestTable.commitAppend(spark, t, (21L to 30L).toDF("id")) // v3
    drainToFiles() // same checkpoint + sink: appends only the delta
    val perVersion = spark.read.parquet(out).groupBy("version").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVersion.keySet == Set(1L, 2L, 3L),
      s"restart must emit ONLY versions past the checkpoint: $perVersion")
    // exactly-once: v1 was NOT re-emitted by the second drain
    assert(perVersion(1L) == v1Files)
  }

  test("startingVersion skips the backlog") {
    val t = tmp("graft_cdc3") + "/t"
    ManifestTable.commitAppend(spark, t, (1L to 10L).toDF("id")) // v1
    ManifestTable.commitAppend(spark, t, (11L to 20L).toDF("id")) // v2
    drain(t, tmp("graft_cdc3_ck"), "cdc_skip", startingVersion = Some(1L))
    assert(spark.table("cdc_skip").select("version").distinct()
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("an overwrite emits its rewritten files as additions") {
    val t = tmp("graft_cdc4") + "/t"
    ManifestTable.commitAppend(spark, t, (1L to 10L).toDF("id"))  // v1
    ManifestTable.commitOverwrite(spark, t, (1L to 4L).toDF("id")) // v2
    drain(t, tmp("graft_cdc4_ck"), "cdc_ow")
    val rows = spark.table("cdc_ow")
    assert(rows.filter(col("version") === 2).count() > 0)
    // no file appears twice: the overwrite wrote fresh staged names
    assert(rows.select("file").distinct().count() == rows.count())
  }

  test("an empty table idles instead of dying") {
    val t = tmp("graft_cdc5") + "/t" // no commits at all
    new java.io.File(t).mkdirs()
    drain(t, tmp("graft_cdc5_ck"), "cdc_empty")
    assert(spark.table("cdc_empty").count() == 0)
  }

  test("missing path option is a clear error") {
    val e = intercept[Exception] {
      spark.readStream.format("graft-manifest-cdc").load()
    }
    assert(e.getMessage.contains("path"))
  }
}
