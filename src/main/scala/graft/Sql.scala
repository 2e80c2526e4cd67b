package graft

import org.apache.spark.sql.SparkSession

/** Mini SQL shell over the engine: registers the testdata views + graft
  * functions and runs one query.
  * Usage: `scripts/run_class.sh graft.Sql <sfDir> "<SQL>"` */
object Sql {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerViews(spark, args(0))
    spark.sql(args(1)).show(50, truncate = false)
    spark.stop()
  }
}
