package graft
import org.apache.spark.sql.SparkSession
object Explain { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.sql.shuffle.partitions","4")
    .config("spark.sql.session.timeZone","UTC")
    .config("spark.ui.enabled","false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = a.lift(1).getOrElse("/root/testdata/sf0.001")
  if (a(0) == "bucket_demo") {
    // co-located join demo: bucketed tables join with zero exchanges
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val or = spark.read.parquet(s"$dir/orders.parquet")
    graft.sources.Sources.writeBucketedTable(li, "b_li", "l_orderkey", 8, "l_orderkey")
    graft.sources.Sources.writeBucketedTable(or, "b_or", "o_orderkey", 8, "o_orderkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = spark.table("b_li").join(spark.table("b_or"),
      $"l_orderkey" === $"o_orderkey")
    j.explain("formatted")
    println(s"rows: ${j.count()}")
    spark.stop(); return
  }
  Queries.all.filter(q => a(0) == "all" || a(0).split(",").contains(q.name))
    .foreach { q =>
      println(s"\n========== ${q.name} ==========")
      try q.run(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"ERR ${e.getMessage}") }
    }
  spark.stop()
}}
