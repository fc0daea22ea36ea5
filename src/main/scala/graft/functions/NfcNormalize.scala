package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a codegen'd projection — the canonical
 * prep step for exact-dedup and URL keys over multilingual corpora:
 * `é` typed as one code point and as `e` + COMBINING ACUTE are the
 * same text but different bytes, so un-normalized md5/minhash keys
 * silently split duplicates. NFC (canonical composition) is the W3C-
 * recommended wire form; the kernel is `java.text.Normalizer` (pure
 * JDK, Unicode-conformant). The oracle cross-checks against DuckDB's
 * independent `nfc_normalize` implementation — two engines agreeing
 * on the Unicode algorithm, not a replay of our own code.
 *
 * Same tier as [[HtmlExtract]]: native expression, whole-stage
 * codegen, zero shuffle, null-preserving.
 */
object NfcKernel {
  /** Codegen entry point (called from generated code). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and most
    // corpus text (all-ASCII in particular) is already NFC
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(text)`: Unicode canonical composition. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(text: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(text)))
}
