package graft
import org.apache.spark.sql.SparkSession
object Explain { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions","4")
    .config("spark.sql.session.timeZone","UTC")
    .config("spark.ui.enabled","false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = a.lift(1).getOrElse("/root/testdata/sf0.001")
  Queries.all.filter(q => a(0) == "all" || a(0).split(",").contains(q.name))
    .foreach { q =>
      println(s"\n========== ${q.name} ==========")
      try q.run(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"ERR ${e.getMessage}") }
    }
  spark.stop()
}}
