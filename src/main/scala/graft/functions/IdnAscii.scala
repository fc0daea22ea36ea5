package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * IDN host normalization to ASCII-compatible (ACE/punycode) form — the
 * missing half of RFC 3987 URL keying: `bücher.de` and
 * `xn--bcher-kva.de` are the SAME host on the wire, so un-unified they
 * silently split dedup keys and per-domain caps. Kernel is the JDK's
 * `java.net.IDN.toASCII` (RFC 3490, pure JDK — a validated independent
 * implementation, not hand-typed tables). All-ASCII hosts (virtually
 * the whole corpus) take a scan-only fast path; a label the IDNA
 * algorithm rejects passes through unchanged (hostile input must key
 * SOMEWHERE, not throw).
 *
 * Same tier as [[NfcNormalize]]: native codegen expression, zero
 * shuffle, null-preserving.
 */
object IdnKernel {
  /** Codegen entry point (called from generated code). Output is always
    * lowercase — the ASCII fast path folds case too, so a raw uppercase
    * host keys identically whether or not it went through urlNormalize
    * first (DNS names are case-insensitive; a case-split dedup key is a
    * correctness bug, not a style choice). */
  def toAscii(host: UTF8String): UTF8String = {
    val s = host.toString
    var ascii = true
    var hasUpper = false
    var i = 0
    while (ascii && i < s.length) {
      val c = s.charAt(i)
      if (c >= 128) ascii = false
      else if (c >= 'A' && c <= 'Z') hasUpper = true
      i += 1
    }
    if (ascii) { // already ACE (or plain ASCII) — the hot path
      return if (hasUpper)
        UTF8String.fromString(s.toLowerCase(java.util.Locale.ROOT))
      else host
    }
    try UTF8String.fromString(
      java.net.IDN.toASCII(s).toLowerCase(java.util.Locale.ROOT))
    catch { case _: IllegalArgumentException => host }
  }
}

/** `idn_ascii(host)`: punycode/ACE form of an internationalized host. */
case class IdnAscii(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "idn_ascii"

  override def nullSafeEval(input: Any): Any =
    IdnKernel.toAscii(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IdnKernel.toAscii($c)")

  override protected def withNewChildInternal(newChild: Expression): IdnAscii =
    copy(child = newChild)
}

object IdnAscii {
  def apply(host: Column): Column =
    GraftSqlBridge.column(IdnAscii(GraftSqlBridge.expression(host)))
}
