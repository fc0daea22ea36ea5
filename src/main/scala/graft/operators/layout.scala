package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Storage-layout operators: keys that make a 100 TB table SKIP data at
 * scan time rather than read-and-filter it.
 *
 * Parquet (and every columnar format) keeps min/max statistics per file
 * and row group; a scan with a range predicate skips any unit whose
 * stats exclude it. That pruning is only as good as the LAYOUT — data
 * must be clustered so each file covers a narrow range of the filtered
 * column. A plain sort clusters ONE column perfectly and scatters every
 * other; the Z-order (Morton) curve interleaves the bits of several
 * columns so each file covers a small HYPER-RECTANGLE — a box predicate
 * on any subset of the keyed columns then touches O(boundary) files
 * instead of all of them. This is the standard multi-dimensional
 * clustering trick (Databricks OPTIMIZE ZORDER, Iceberg sort orders);
 * here it is a plain deterministic key column: write with
 * `repartitionByRange(zval).sortWithinPartitions(zval)` and the
 * layout — and the pruning — follows from the engine's existing
 * machinery. LayoutSpec measures the effect directly: the same box
 * predicate touches a fraction of the z-laid files vs all of the
 * randomly-laid ones.
 *
 * Engine-exact: the interleave is pure integer shift/mask arithmetic
 * (Spark `shiftright/shiftleft/&/|` ≡ DuckDB `>> << & |` on BIGINT),
 * replayed verbatim by the oracle.
 */
object Layout {

  /**
   * Morton/Z-value of two non-negative integer coordinates, each
   * truncated to its low `bits` bits: result bit 2i is bit i of `x`,
   * bit 2i+1 is bit i of `y`. Callers map raw columns onto the
   * [0, 2^bits) grid first (modulo, bucketed rank, or scaled range —
   * any monotone-enough mapping keeps neighbors near).
   */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1, 31], got $bits")
    val xs = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ys = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** The matching DuckDB expression for [[zValue]] — the oracle's half
    * of the contract, generated from the same bit walk. */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits in [1, 31], got $bits")
    val m = (1L << bits) - 1
    // every term fully parenthesized: DuckDB (Postgres-style) gives |,
    // & and << ONE precedence level, left-associative — an unwrapped
    // `a << 2 | b << 3` parses as ((a << 2) | b) << 3 and the
    // accumulated shifts overflow BIGINT
    val terms = (0 until bits).flatMap { i =>
      Seq(s"(((($x & $m) >> $i) & 1) << ${2 * i})",
        s"(((($y & $m) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }
}
