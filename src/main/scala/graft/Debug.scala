package graft
import org.apache.spark.sql.SparkSession
object Debug { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions","4")
    .config("spark.sql.session.timeZone","UTC")
    .config("spark.ui.enabled","false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  try {
    val df = SparkEntry.queries(a(0))(spark, a.lift(1).getOrElse("/root/testdata/sf0.001"))
    df.show(5, false)
  } catch { case e: Throwable => e.printStackTrace() }
  spark.stop()
}}
