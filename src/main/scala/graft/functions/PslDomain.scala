package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Registrable-domain extraction under the full Public Suffix List
 * ALGORITHM (publicsuffix.org — public data): exception rules beat
 * everything, else the matching rule with the most labels wins
 * (`*` matches exactly one label), else the implicit `*` default rule
 * makes the bare TLD the suffix; the registrable domain is the public
 * suffix plus one more label. A host that IS a public suffix (or a
 * single label) degrades to itself.
 *
 * Rules load once per JVM from `graft/psl_snapshot.dat` (PSL line
 * format) — swap that resource for the verbatim ICANN section in
 * production; this container has no egress, so the embedded snapshot
 * reconstructs the section's structure (all rule classes + the major
 * second-level registries; see the file header for the documented
 * omissions). Replaces the last-two-labels-plus-curated-set heuristic,
 * which mis-keyed `pref.aichi.jp`-class and `*.ck`-class hosts.
 *
 * Same tier as [[NfcNormalize]]: native expression, whole-stage
 * codegen, zero shuffle, null-preserving. Lookups are three hash-set
 * probes per label of the host — O(labels), no regex.
 */
object PslKernel {

  /** (exact rules, wildcard bases X for `*.X`, exception names sans `!`). */
  private[functions] lazy val rules: (java.util.HashSet[String],
      java.util.HashSet[String], java.util.HashSet[String]) = {
    val exact = new java.util.HashSet[String]
    val wildcard = new java.util.HashSet[String]
    val exception = new java.util.HashSet[String]
    val in = getClass.getResourceAsStream("/graft/psl_snapshot.dat")
    require(in != null, "psl_snapshot.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().foreach { raw =>
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          val rule = line.takeWhile(!_.isWhitespace).toLowerCase
          if (rule.startsWith("!")) exception.add(rule.substring(1))
          else if (rule.startsWith("*.")) wildcard.add(rule.substring(2))
          else if (rule.nonEmpty) exact.add(rule)
          ()
        }
      }
    } finally src.close()
    (exact, wildcard, exception)
  }

  /** Registrable domain of an already-lowercased, port-free host. */
  def registrableJvm(host: String): String = {
    if (host == null || host.isEmpty) return host
    val (exact, wildcard, exception) = rules
    // start offset of every label
    var nLabels = 1
    var i = 0
    while (i < host.length) { if (host.charAt(i) == '.') nLabels += 1; i += 1 }
    val starts = new Array[Int](nLabels)
    starts(0) = 0
    var li = 1
    i = 0
    while (i < host.length) {
      if (host.charAt(i) == '.') { starts(li) = i + 1; li += 1 }
      i += 1
    }
    // exception rules take priority over all (PSL spec §Algorithm)
    var psLabels = -1
    i = 0
    while (psLabels < 0 && i < nLabels) {
      if (exception.contains(host.substring(starts(i))))
        psLabels = (nLabels - i) - 1 // suffix = exception rule sans left label
      i += 1
    }
    if (psLabels < 0) {
      i = 0
      while (psLabels < 0 && i < nLabels) {
        val suffix = host.substring(starts(i))
        if (exact.contains(suffix)) psLabels = nLabels - i
        else if (i + 1 < nLabels &&
            wildcard.contains(host.substring(starts(i + 1))))
          psLabels = nLabels - i // `*.X` matched: * bound to label i
        i += 1
      }
    }
    if (psLabels < 0) psLabels = 1 // the implicit default rule `*`
    if (nLabels <= psLabels) host // host IS a suffix — degrade, keep keys total
    else host.substring(starts(nLabels - psLabels - 1))
  }

  /** Codegen entry point (called from generated code). Case-folds ASCII
    * uppercase before the rule probes — the PSL tables are lowercase, so
    * a raw `WWW.Example.COM` must not silently miss every rule; the fold
    * is a branch-free scan paid only when an uppercase byte exists. */
  def registrable(host: UTF8String): UTF8String = {
    val s0 = host.toString
    var hasUpper = false
    var i = 0
    while (!hasUpper && i < s0.length) {
      if (Character.isUpperCase(s0.charAt(i))) hasUpper = true
      i += 1
    }
    val s = if (hasUpper) s0.toLowerCase(java.util.Locale.ROOT) else s0
    val r = registrableJvm(s)
    if (r eq s0) host else UTF8String.fromString(r)
  }
}

/** `psl_domain(host)`: registrable domain under the PSL algorithm. */
case class PslDomain(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "psl_domain"

  override def nullSafeEval(input: Any): Any =
    PslKernel.registrable(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PslKernel.registrable($c)")

  override protected def withNewChildInternal(newChild: Expression): PslDomain =
    copy(child = newChild)
}

object PslDomain {
  def apply(host: Column): Column =
    GraftSqlBridge.column(PslDomain(GraftSqlBridge.expression(host)))
}
