package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Access to the session FunctionRegistry (private[sql] in Spark 4) so
  * graft's custom expressions can be registered as SQL-callable
  * functions on an already-running session. */
object RegistryBridge {
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
}
