package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ingest.Ingest

/** CLI demo of entry point A: canned-fetcher ingest → bronze → silver →
  * gold on a temp dir, printing the resulting star schema. Usage:
  * `scripts/run_class.sh graft.PipelineDemo [workdir]`. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)

    val fetcher = new Ingest.Fetcher {
      def fetchPage(id: String, endpoint: String, page: Int,
                    since: Option[String]): Option[String] =
        if (page > 1) None
        else if (endpoint == "media")
          Some(s"""{"hashed_id":"$id","name":"Video $id on YouTube","created":1700000000}""")
        else
          Some(s"""{"visitor_key":"vis_$id","ip_address":"9.9.9.9","country":"DE","events":[{"type":"play","time":1700000000,"duration_watched":"5","percent_watched":"50"},{"type":"play","time":1700000400,"duration_watched":"7","percent_watched":"80"},{"type":"end","time":1700000500,"duration_watched":"1","percent_watched":"100"}]}""")
    }

    val conf = Pipeline.Conf(s"$root/raw", s"$root/silver",
      mediaIds = Seq("abc1", "zzz9"),
      clock = Some(to_timestamp(lit("2024-06-01 00:00:00"))))
    val res = Pipeline.run(spark, conf, fetcher)

    println(s"workdir: $root")
    println("=== dim_media ==="); res.dimMedia.show(false)
    println("=== dim_visitor ==="); res.dimVisitor.show(false)
    println("=== fact_engagement ==="); res.fact.show(false)
    println("=== gold fact ==="); res.goldFact.show(false)
    res.qualityReports.foreach { case (n, metrics) =>
      println(s"=== DQ $n (observed, zero extra jobs) ===")
      metrics.toSeq.sortBy(_._1).foreach { case (k, v) =>
        println(f"  $k%-28s $v")
      }
    }
    spark.stop()
  }
}
