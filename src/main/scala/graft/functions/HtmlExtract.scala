package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused single-kernel HTML → text extraction: the scale tier of
 * [[graft.operators.TextAnalysis.htmlToText]]. The Column form is a
 * 15-pass regex/replace chain — deliberately, so a SQL engine can replay
 * it verbatim — and at 1000× its regex passes ARE the measured cost
 * (~24 µs/doc, SCALE.md round-9). This kernel computes the **byte-
 * identical** result with hand-rolled `indexOf` scans instead of
 * `java.util.regex` NFA walks, one UTF8String↔String conversion total
 * instead of one per regex pass, and the four whitespace passes fused
 * into a single run-classifier proven equivalent below. Equality with
 * the Column chain is property-pinned (HtmlFusedSpec: adversarial
 * fixtures + ScalaCheck tag-soup, plus the corpus), and the registered
 * query (q_html_fused) reuses q_html_text's ground-truth oracle —
 * correctness does not rest on this file's comments.
 *
 * Pass structure mirrors the chain exactly — the passes are SEQUENTIAL
 * by semantics, not style: e.g. `<style>a<script>b</style>c</script>`
 * must resolve script-first (the chain's order), and `"<a<p>b>"` shows
 * block-tag newlines must land before the generic tag strip sees the
 * string. Each pass short-circuits to the same String reference when it
 * finds no first match, so clean text pays one scan per pass and zero
 * copies.
 *
 * Regex-fidelity notes (each encodes a java.util.regex behavior the
 * scans must reproduce, all covered by the spec):
 *  - `(?i)` without UNICODE_CASE folds ASCII ONLY — so the scans fold
 *    [A-Z] and nothing else (`String.regionMatches(true,…)` would also
 *    fold U+212A KELVIN onto `k`, a real divergence, and is not used);
 *  - `<script[^>]*>` admits exactly the FIRST following `>` (the class
 *    cannot cross one), and the lazy `.*?</script>` takes the EARLIEST
 *    close tag; when either is absent, no later start can match (any
 *    later candidate needs the same delimiter even further right), so
 *    the scan breaks instead of rescanning — the same applies to the
 *    comment, block-tag, and strip passes;
 *  - `\b` after the block-tag alternation uses Java's boundary word set
 *    (`_` or `Character.isLetterOrDigit`, Unicode-aware — NOT `\w`'s
 *    ASCII set, see [[isBoundWord]]): at most one alternative can both
 *    match and sit on a boundary, so ordered first-match is exact;
 *  - `\s` is `[ \t\n\x0B\f\r]` (no Unicode whitespace), and the chain's
 *    `[^\S\n]+` → `" ?\n ?"` → `\n+` → trim cascade reduces to: each
 *    maximal \s-run becomes `\n` if it contains a newline else a space,
 *    and edge runs vanish. (Proof sketch: pass 1 leaves no two adjacent
 *    spaces inside a run; pass 2's leftmost-greedy scan then absorbs
 *    every remaining space into an adjacent `\n` match; pass 3 collapses
 *    the newline run; trim kills edge runs of either kind.)
 */
object HtmlKernel {

  /** Word-character test of java.util.regex `\b` WITHOUT
    * UNICODE_CHARACTER_CLASS: `Pattern.Bound.isWord` is
    * `ch == '_' || Character.isLetterOrDigit(ch)` on the CODE POINT —
    * Unicode-aware even though `\w` is ASCII-only in the same mode (the
    * documented Java asymmetry; 'é' bounds differently than '>'). The
    * spec's tag-soup generator plants 'é' next to tag names to pin this. */
  private def isBoundWord(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** ASCII-only case-insensitive region match; `pat` must be lowercase. */
  private def regionIC(s: String, at: Int, pat: String): Boolean = {
    if (at < 0 || at + pat.length > s.length) return false
    var i = 0
    while (i < pat.length) {
      var c = s.charAt(at + i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      if (c != pat.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Leftmost ASCII-case-insensitive occurrence; `pat` lowercase. */
  private def indexOfIC(s: String, pat: String, from: Int): Int = {
    val n = s.length - pat.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (regionIC(s, i, pat)) return i
      i += 1
    }
    -1
  }

  /** `(?is)<tag[^>]*>.*?</tag>` → " " (script/style bodies). */
  private def removeSections(s: String, tag: String): String = {
    val open = "<" + tag
    val close = "</" + tag + ">"
    var i = indexOfIC(s, open, 0)
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var prev = 0
    while (i >= 0) {
      val j = s.indexOf('>', i + open.length)
      val k = if (j < 0) -1 else indexOfIC(s, close, j + 1)
      if (k < 0) i = -1 // missing delimiter: no later start can match either
      else {
        sb.append(s, prev, i).append(' ')
        prev = k + close.length
        i = indexOfIC(s, open, prev)
      }
    }
    if (prev == 0) s else sb.append(s, prev, s.length).toString
  }

  /** `(?s)<!--.*?-->` → " ". */
  private def removeComments(s: String): String = {
    var i = s.indexOf("<!--")
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var prev = 0
    while (i >= 0) {
      val k = s.indexOf("-->", i + 4)
      if (k < 0) i = -1
      else {
        sb.append(s, prev, i).append(' ')
        prev = k + 3
        i = s.indexOf("<!--", prev)
      }
    }
    if (prev == 0) s else sb.append(s, prev, s.length).toString
  }

  /** Alternation order of the block-tag regex, tried first-match like the
    * regex engine; the `\b` check makes at most one name viable per site. */
  private val blockNames: Array[String] = Array(
    "br", "p", "div", "li", "ul", "ol", "table", "tr", "blockquote",
    "pre", "hr", "h1", "h2", "h3", "h4", "h5", "h6")

  /** `(?i)</?(?:br|p|…|h[1-6])\b[^>]*>` → "\n". */
  private def blockTagsToNewlines(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var prev = 0
    var i = s.indexOf('<')
    while (i >= 0) {
      var pos = i + 1
      if (pos < n && s.charAt(pos) == '/') pos += 1
      var name: String = null
      var t = 0
      while (name == null && t < blockNames.length) {
        val cand = blockNames(t)
        if (regionIC(s, pos, cand) &&
            (pos + cand.length >= n || !isBoundWord(s.codePointAt(pos + cand.length))))
          name = cand
        t += 1
      }
      if (name == null) i = s.indexOf('<', i + 1)
      else {
        val j = s.indexOf('>', pos + name.length)
        if (j < 0) i = -1 // no '>' remains: nothing later can match
        else {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(s, prev, i).append('\n')
          prev = j + 1
          i = s.indexOf('<', prev)
        }
      }
    }
    if (sb == null) s else sb.append(s, prev, n).toString
  }

  /** `<[^>]*>` → " " (remaining inline tags). */
  private def stripTags(s: String): String = {
    var i = s.indexOf('<')
    var sb: java.lang.StringBuilder = null
    var prev = 0
    while (i >= 0) {
      val j = s.indexOf('>', i + 1)
      if (j < 0) i = -1 // a dangling '<' stays literal, like the regex
      else {
        if (sb == null) sb = new java.lang.StringBuilder(s.length)
        sb.append(s, prev, i).append(' ')
        prev = j + 1
        i = s.indexOf('<', prev)
      }
    }
    if (sb == null) s else sb.append(s, prev, s.length).toString
  }

  /** The chain's entity decode: five literal replaces, `&amp;` LAST and
    * single-pass so `&amp;lt;` yields the literal `&lt;`. `String.replace`
    * is the same leftmost-non-overlapping contract as Spark's
    * `StringReplace`, including not rescanning replacement text. */
  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  private def isJavaSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The fused whitespace cascade (see class doc): maximal \s-runs map to
    * `\n` (run contains a newline) or `' '`, edge runs drop. */
  private def normalizeWhitespace(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var runLen = 0
    var runFirst = ' '
    var runHasNl = false
    var changed = false // length-preserving swaps ('\t'→' ') must not short-circuit
    while (i < n) {
      val c = s.charAt(i)
      if (isJavaSpace(c)) {
        if (runLen == 0) runFirst = c
        runLen += 1
        if (c == '\n') runHasNl = true
      } else {
        if (runLen > 0) {
          if (sb.length > 0) {
            val out = if (runHasNl) '\n' else ' '
            sb.append(out)
            if (runLen != 1 || out != runFirst) changed = true
          } else changed = true // leading run dropped
          runLen = 0
          runHasNl = false
        }
        sb.append(c)
      }
      i += 1
    }
    if (runLen > 0) changed = true // trailing run dropped
    if (!changed) s else sb.toString
  }

  /** The full fused pipeline over a plain String (spec entry point). */
  def extract(html: String): String = {
    var s = removeSections(html, "script")
    s = removeSections(s, "style")
    s = removeComments(s)
    s = blockTagsToNewlines(s)
    s = stripTags(s)
    s = decodeEntities(s)
    normalizeWhitespace(s)
  }

  /** Codegen entry point (called from generated code). */
  def extract(html: UTF8String): UTF8String =
    UTF8String.fromString(extract(html.toString))
}

/** `html_to_text(html)`: fused extraction as a codegen'd projection —
  * same tier as [[BlocklistHits]]: static call inside whole-stage
  * codegen, no UDF serialization, no shuffle. */
case class HtmlExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  override def nullSafeEval(input: Any): Any =
    HtmlKernel.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlKernel.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)
}

object HtmlExtract {
  def apply(html: Column): Column =
    GraftSqlBridge.column(HtmlExtract(GraftSqlBridge.expression(html)))
}
