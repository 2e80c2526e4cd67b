package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StateInspectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("maxFilesPerTrigger bounds each micro-batch during a backfill") {
    // the rate-limit knob that makes a month-long backfill replay as
    // bounded micro-batches instead of one giant state-blowing batch:
    // AvailableNow honors it, so 3 staged files → 3 single-file batches
    val in = java.nio.file.Files.createTempDirectory("graft_rate_in")
    val out = java.nio.file.Files.createTempDirectory("graft_rate_out")
    try {
      for (i <- 1 to 3)
        Seq((i.toLong, s"f$i")).toDF("id", "tag").coalesce(1)
          .write.mode("append").parquet(in.toString)
      val schema = spark.read.parquet(in.toString).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in.toString)
        .writeStream.format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 3,
        s"expected 3 single-file batches, saw ${batches.length}")
      assert(batches.forall(_.numInputRows == 1))
      assert(spark.read.parquet(s"$out/data").count() == 3)
    } finally {
      import scala.jdk.CollectionConverters._
      for (root <- Seq(in, out))
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("state-metadata + statestore read a dedup checkpoint offline") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "event_id", "payload")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_state_spec").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_state_spec_out").toString
    try {
      val deduped = StreamingFact.dedupStream(df, "ts", Seq("event_id"))
      val q = deduped.writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      mem.addData(
        (ts("2024-01-01 10:00:00"), 1L, "a"),
        (ts("2024-01-01 10:00:01"), 1L, "a-dup"),
        (ts("2024-01-01 10:00:02"), 2L, "b"))
      q.processAllAvailable()
      q.stop()

      val meta = StateInspect.stateMetadata(spark, ckpt)
      val m = meta.collect()
      assert(m.length == 1, s"one stateful operator, got:\n${m.mkString}")
      val opName = m.head.getAs[String]("operatorName")
      assert(opName == "dedupeWithinWatermark",
        s"operator name drifted: $opName")
      assert(m.head.getAs[Int]("numPartitions") ==
        spark.conf.get("spark.sql.shuffle.partitions").toInt)

      val rows = StateInspect.stateRows(spark, ckpt)
      // state keys are exactly the distinct event_ids seen (none
      // evicted: watermark trails the single batch)
      val keys = rows.select(col("key.event_id")).as[Long]
        .collect().sorted.toSeq
      assert(keys == Seq(1L, 2L), s"state keys: $keys")
      // partition_id exposes state placement for skew analysis
      assert(rows.select("partition_id").as[Int].collect()
        .forall(p => p >= 0 &&
          p < spark.conf.get("spark.sql.shuffle.partitions").toInt))
    } finally {
      for (root <- Seq(ckpt, out)) {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(root)
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }
}
