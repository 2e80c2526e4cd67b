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
    if (a.lift(2).contains("values")) {
      // dump every row as a DuckDB VALUES tuple, for freezing oracles
      val fields = df.schema.fields
      df.collect().foreach { r =>
        val cells = fields.zipWithIndex.map { case (f, i) =>
          val v = r.get(i)
          f.dataType.typeName match {
            case "long"    => s"CAST($v AS BIGINT)"
            case "integer" => s"CAST($v AS INTEGER)"
            case "double"  => s"CAST('$v' AS DOUBLE)"
            case _         => s"'$v'"
          }
        }
        println(cells.mkString("      (", ", ", "),"))
      }
      println(s"-- ${df.count()} rows; cols: ${fields.map(_.name).mkString(", ")}")
    } else if (a.lift(2).contains("explain")) {
      // formatted physical plan with AQE off, for scale-shape audits
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries(a(0))(spark, a.lift(1)
        .getOrElse("/root/testdata/sf0.001")).explain("formatted")
    } else df.show(5, false)
  } catch { case e: Throwable => e.printStackTrace() }
  spark.stop()
}}
