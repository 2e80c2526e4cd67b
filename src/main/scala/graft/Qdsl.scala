package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The registry cell and the helpers every registry part shares.
  * Lives outside [[Queries]] so the part objects (QueriesCore, ...)
  * never touch the composing object during their own initialization
  * (object-init cycles NPE under the JVM's re-entrant class init). */
private[graft] object Qdsl {

  case class Q(name: String,
               run: (SparkSession, String) => DataFrame,
               oracle: Option[String])

  private[graft] def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark 4's
    * parquet reader rejects outright; read nanos as long (legacy conf,
    * runtime-settable) and convert to a micros timestamp. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Exact, order-independent sum of a 2-decimal double measure. */
  private[graft] def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")
}
