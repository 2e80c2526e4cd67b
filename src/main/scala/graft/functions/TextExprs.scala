package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object TextExprs {
  /** Unicode NFC normalization — see [[NfcNormalize]]. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expr(text)))
}

/** Unicode NFC normalization (canonical composition): `e` + combining
  * acute → `é`, fullwidth/compat forms untouched. The mandatory first
  * step of any text-dedup pipeline — NFD and NFC spellings of the same
  * string hash to DIFFERENT fingerprints/MinHash signatures, so a
  * corpus mixing them under-dedups silently. Spark SQL has no built-in
  * for it; this wraps the JDK's `java.text.Normalizer` (ICU-equivalent
  * for NFC) as a per-row expression: scan speed, no shuffle, null in →
  * null out. Fast path: `Normalizer.isNormalized` avoids allocating
  * for already-NFC text (the overwhelmingly common case). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
