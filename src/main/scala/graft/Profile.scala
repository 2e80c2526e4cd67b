package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB breakdown of one registry query — the measurement tool the
  * optimization guide's §1 empirical loop needs when the Spark UI is
  * disabled: runs the named query through the noop sink (after one
  * untimed warm attempt) and prints every job's wall-clock, task time,
  * shuffle bytes and description, so a multi-job query's cost
  * attributes to its phases instead of one opaque total.
  *
  * Usage: scripts/run_class.sh graft.Profile <query> [sfdir] [cpus]
  */
object Profile {
  private case class JobRec(id: Int, desc: String, started: Long,
                            var ended: Long = 0L)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogNoise.suppressKnownBenign()
    val q = Queries.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))

    // warm: JIT, codegen cache, parquet footers — same as Bench's warmup
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"[profile] warm attempt failed: $e") }

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageTask = new java.util.concurrent.atomic.AtomicLong()
    val stageLines =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, JobRec(e.jobId,
          Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse(""), e.time))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.ended = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted)
      : Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stageTask.addAndGet(m.executorRunTime)
        stageLines.add(
          f"    stage ${i.stageId}%4d ${i.numTasks}%5d tasks " +
          f"run=${m.executorRunTime / 1e3}%8.2fs " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%9.1fMB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%9.1fMB " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%9.1fMB " +
          s"[${i.name.takeWhile(_ != '\n').take(90)}]")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    System.gc(); Thread.sleep(100)
    val t0 = System.nanoTime()
    q.run(spark, dir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val recs = jobs.values().asScala.toSeq.sortBy(_.id)
    println(f"\n=== $name: $total%.3f s wall, ${recs.size} jobs, " +
      f"task-time ${stageTask.get() / 1e3}%.1f s ===")
    recs.foreach { r =>
      println(f"  job ${r.id}%4d ${(r.ended - r.started) / 1e3}%8.3fs  ${r.desc.take(100)}")
    }
    println("  --- stages ---")
    stageLines.asScala.foreach(println)
    spark.stop()
  }
}
