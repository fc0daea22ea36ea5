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

  /**
   * K-way Morton/Z-value (round-12, the GraftTable clustered-compaction
   * key): bit i of column j lands at interleaved position i*k + j, so
   * each file of a z-sorted layout covers a small hyper-box in ALL k
   * dimensions at once. Columns must already be mapped onto the
   * [0, 2^bits) grid by a MONOTONE map (scaled range — [[gridScale]] —
   * when range pruning is the goal; modulo only when locality of
   * hash-like keys is). k * bits must fit a positive long.
   */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.length
    require(k >= 1, "at least one column")
    require(bits >= 1 && k * bits <= 62, s"k*bits <= 62, got $k*$bits")
    val masked = cols.map(_.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    (for {
      i <- 0 until bits
      (c, j) <- masked.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_ bitwiseOR _)
  }

  /** Monotone map of `c` from its global [lo, hi] onto the [0, 2^bits)
    * grid — the range-preserving coordinate for [[zValueN]]. Constant
    * columns (hi == lo) map to 0. */
  def gridScale(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1, 31], got $bits")
    val cells = 1L << bits
    if (hi <= lo) lit(0L)
    else least(lit(cells - 1),
      ((c.cast("long") - lit(lo)).cast("double") / lit((hi - lo).toDouble)
        * lit(cells.toDouble)).cast("long"))
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
