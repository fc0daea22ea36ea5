package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Substring blocklist matching — the UT1/word-list filtering step every
 * web-crawl curation pipeline runs (flag or drop documents containing
 * phrases from a shipped blocklist artifact). The pattern table here is a
 * static stand-in with the same shape as a real list; in production it is
 * a few-thousand-entry file loaded once per JVM.
 *
 * Match semantics: LEFTMOST NON-OVERLAPPING occurrences of each pattern
 * in the lowercased document, counted independently per pattern — the
 * exact contract of SQL `replace()`, so the DuckDB oracle replays each
 * count as `(len(t) - len(replace(t, p, ''))) / len(p)` with no custom
 * code. (An Aho–Corasick automaton reports ALL matches including
 * overlaps — a different contract; with leftmost non-overlap the walk is
 * `indexOf` stepping by the pattern length.)
 *
 * Scale shape: a pure projection kernel (codegen'd static call, no UDF
 * serialization, no shuffle) — the full-corpus filter is one map stage,
 * same tier as [[HashTfLinearMargin]] and [[BpeTokenCount]]. Cost is
 * O(|patterns| · |text|); for the few-thousand-pattern production list
 * the drop-in upgrade is a trie walk over the same lowercased text with
 * an identical leftmost-non-overlap contract — the operator surface and
 * oracle do not change.
 */
object Blocklist {

  /** Static phrase artifact (lowercase). Distinct, non-empty, and none a
    * substring of another — so per-pattern counts are independent of the
    * order patterns are applied in. */
  val patterns: Array[String] = Array(
    "hash join", "table scan", "sort merge", "slow query", "big data")

  require(patterns.distinct.length == patterns.length && patterns.forall(_.nonEmpty),
    "blocklist patterns must be distinct and non-empty")

  /** Leftmost non-overlapping occurrence count of `pat` in `s`. */
  private def countNonOverlap(s: String, pat: String): Long = {
    var n = 0L
    var i = s.indexOf(pat)
    while (i >= 0) { n += 1; i = s.indexOf(pat, i + pat.length) }
    n
  }

  /** Per-pattern counts for one document (called from generated code). */
  def hitCounts(text: UTF8String): ArrayData = {
    val t = text.toString.toLowerCase
    val out = new Array[Any](patterns.length)
    var i = 0
    while (i < patterns.length) { out(i) = countNonOverlap(t, patterns(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** `blocklist_hits(text)`: the per-pattern leftmost-non-overlapping match
  * counts (`array<long>`, index-aligned with [[Blocklist.patterns]]) as a
  * codegen'd projection. */
case class BlocklistHits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "blocklist_hits"

  override def nullSafeEval(input: Any): Any =
    Blocklist.hitCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Blocklist.hitCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): BlocklistHits =
    copy(child = newChild)
}

object BlocklistHits {
  def apply(text: Column): Column =
    GraftSqlBridge.column(BlocklistHits(GraftSqlBridge.expression(text)))
}
