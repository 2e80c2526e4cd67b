package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.RegistryBridge

/** Registers graft's custom Catalyst expressions as SQL-callable
  * functions on a running session, e.g.
  * `SELECT minhash_sig(shingle_set(text, 3), 64) FROM docs`.
  * Idempotent (createOrReplace). */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString.toInt
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  def register(spark: SparkSession): Unit = {
    val reg = RegistryBridge.functionRegistry(spark)
    reg.createOrReplaceTempFunction("shingle_set",
      es => ShingleSet(es.head, intLit(es(1), "k")), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es.head, intLit(es(1), "numPerm")), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("dot_long",
      es => DotLong(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      es => CosineSim(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize",
      es => NfcNormalize(es.head), "scala_udf")
  }
}
