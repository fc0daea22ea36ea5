package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal / range join operators Spark lacks as built-ins, shaped so
 * neither ever degenerates into a nested-loop join.
 *
 * Both are composed from existing operators (shuffle + window, or
 * explode + equi-join) rather than a custom SparkPlan: the semantics fit
 * Catalyst's existing physical operators exactly, so a custom strategy
 * would only duplicate what whole-stage codegen already optimizes.
 */
object Joins {

  /**
   * Backward as-of join: for each left row, the single latest right row
   * with the same key and rightTime <= leftTime (ties at the same
   * instant include the right row, like SQL ASOF's `>=`). Classic
   * point-in-time feature lookup ("the last click before this
   * purchase", "the quote in force at trade time").
   *
   * Implementation is ONE shuffle at any scale: tag and union both
   * sides, hash-partition by key, sort each key's rows by
   * (time, side-tag), and carry the most recent right payload forward
   * with a running `last(ignoreNulls)` window — O(n log n_key) per key,
   * no per-row probe, no nested loop, and the sort is exactly the
   * time-series layout a 100 TB event store already wants. The join is
   * left-outer: unmatched left rows keep a null payload (filter
   * `matched IS NOT NULL` for inner semantics).
   *
   * `tolerance` (same unit as the time columns) rejects matches older
   * than leftTime - tolerance — stale quotes don't silently join.
   *
   * Skew caveat: one pathological key (a single user holding 1% of
   * 100 TB) serializes that key's sort into one task. The standard
   * mitigations compose from outside: pre-filter the hot key into its
   * own as-of call, or coarsen keys. Salting cannot apply — the
   * running-last is order-dependent within a key by construction.
   *
   * Right rows sharing an identical (key, time) are tie-broken by the
   * greatest payload struct (deterministic, partition-independent);
   * engines whose ASOF leaves this unspecified agree with us whenever
   * right timestamps are unique per key.
   *
   * @param payload right columns to carry onto matched left rows; they
   *                must not collide with left column names.
   */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTime: String, rightTime: String,
                   payload: Seq[String],
                   tolerance: Long = Long.MaxValue): DataFrame = {
    require(keyCols.nonEmpty, "asofBackward needs at least one key column")
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"payload columns ${payload.mkString(", ")} must not collide with left columns")
    val reserved = Seq("__t", "__side", "__rv", "__m", "matched_time")
    require(reserved.forall(r => !leftCols.contains(r) && !right.columns.contains(r)),
      s"columns ${reserved.mkString(", ")} are reserved by asofBackward; rename them first")
    // __rv packs the right time + payload into one struct so a single
    // last(ignoreNulls) carries the whole match (and the tolerance check
    // can null the entire match atomically, never a torn row).
    val rvStruct = struct(
      (col(rightTime).cast("long").as("__rt") +: payload.map(col)): _*)
    val l = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(
        right.select(rvStruct).schema.head.dataType))
    val r = right
      .select((keyCols.map(col) :+ col(rightTime).cast("long").as("__t")) :+
        rvStruct.as("__rv"): _*)
      .withColumn("__side", lit(0))
    // Right rows sort before left rows at the same instant (__side 0 < 1)
    // so an equal-time right row is visible to the left row — ASOF `>=`.
    val unioned = l.select(
      (keyCols.map(col) :+ col("__t") :+ col("__side") :+ col("__rv")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__rv"), ignoreNulls = true).over(w)
    val inTol = col("__m").isNotNull &&
      (col("__t") - col("__m.__rt") <= tolerance)
    unioned
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
      .withColumn("__m", when(inTol, col("__m")))
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__m.$p").as(p)) :+
        col("__m.__rt").as("matched_time"): _*)
  }

  /**
   * Point-in-interval range join WITHOUT an equi-key: every (point,
   * interval) pair with lo <= point <= hi. Naively this is a
   * BroadcastNestedLoopJoin — O(points x intervals) compares and a
   * broadcast of whichever side Spark guesses smaller; at 100 TB it is
   * the single worst plan Spark can pick. Binning makes it an
   * equi-join: intervals explode to the fixed-width bins they overlap,
   * points compute their one bin, the bin is the join key, and the
   * exact predicate re-filters the candidates. Work becomes
   * O(points + intervals x span/binWidth + candidates) with an
   * ordinary shuffle/broadcast hash join Catalyst already knows how to
   * optimize (AQE, skew split, broadcast-when-small all apply).
   *
   * `binWidth` trades interval replication (span/binWidth copies per
   * interval) against candidate precision (points per bin); near the
   * median interval span is a good default. `maxBinsPerInterval` is the
   * fail-fast guard for a degenerate width: one agg over the (small,
   * dimension-shaped) intervals side, nothing over the points.
   */
  def rangePointJoin(points: DataFrame, pointCol: String,
                     intervals: DataFrame, loCol: String, hiCol: String,
                     binWidth: Double,
                     maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "column __bin is reserved by rangePointJoin; rename it first")
    // the guard agg below and the join both evaluate the intervals plan;
    // persist the (dimension-shaped) side so an expensive upstream query
    // runs once — the ContextCleaner drops the cache when unreferenced
    val iv = intervals.persist()
    val spansRow = iv.agg(
      max(ceil(col(hiCol) / binWidth) - floor(col(loCol) / binWidth) + 1)
        .cast("long")).head()
    // empty intervals: max over nothing is null — empty join, not an NPE
    val spans = if (spansRow.isNullAt(0)) 0L else spansRow.getLong(0)
    require(spans <= maxBinsPerInterval,
      s"an interval overlaps $spans bins at binWidth=$binWidth " +
        s"(cap $maxBinsPerInterval): widen binWidth or raise the cap")
    val binned = iv.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    points
      .withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /**
   * Blocked fuzzy entity matching — the entity-resolution primitive: a
   * dirty feed matched against a canonical catalog by edit distance,
   * emitting every (dirty, clean) pair with
   * `levenshtein(names) <= maxDist`.
   *
   * Never all-pairs: candidates are an equi-join on the compound block
   * (caller's `blockOf(name)`, length band). A true match can sit at
   * most `maxDist` characters away in length, so the dirty side
   * EXPLODES the bands its length±maxDist window touches (an
   * array_distinct'd sequence) while the catalog keeps its single band —
   * each candidate pair forms exactly once. The levenshtein verify runs
   * only inside blocks.
   *
   * The block expression is a first-class parameter because it IS the
   * scale lever: candidate volume per block grows with (block
   * frequency)², so the key's cardinality must grow with the data. A
   * low-cardinality key (e.g. the name's first token over a fixed
   * vocabulary) goes quadratic the moment the corpus outgrows the
   * vocabulary — measured here: first-token blocking on the synthetic
   * part names ran minutes at 100× while a mutation-stable
   * discriminative key (first token + a stable suffix prefix) stays
   * flat. Design rule: derive the key only from characters the expected
   * corruption cannot touch.
   *
   * Null/empty names block as `blockOf`'s value on '' — such rows only
   * meet each other, and only within band.
   */
  def fuzzyMatch(dirty: DataFrame, dirtyId: Column, dirtyName: Column,
                 catalog: DataFrame, cleanId: Column, cleanName: Column,
                 maxDist: Int, blockOf: Column => Column,
                 bandWidth: Int = 3): DataFrame = {
    require(maxDist >= 0 && bandWidth > 0, "maxDist >= 0, bandWidth > 0")
    def nn(c: Column) = coalesce(c, lit(""))
    val cat = catalog.select(cleanId.as("clean_id"), cleanName.as("clean_name"),
      coalesce(blockOf(nn(cleanName)), lit("")).as("__blk"),
      floor(length(nn(cleanName)) / bandWidth).cast("int").as("__bd"))
    val d = dirty.select(dirtyId.as("dirty_id"), dirtyName.as("dirty_name"),
        coalesce(blockOf(nn(dirtyName)), lit("")).as("__blk"),
        array_distinct(sequence(
          floor((length(nn(dirtyName)) - maxDist) / bandWidth).cast("int"),
          floor((length(nn(dirtyName)) + maxDist) / bandWidth).cast("int")))
          .as("__bds"))
      .withColumn("__bd", explode(col("__bds"))).drop("__bds")
    d.join(cat, Seq("__blk", "__bd"))
      .withColumn("dist", levenshtein(col("dirty_name"), col("clean_name")))
      .filter(col("dist") <= maxDist)
      .select(col("dirty_id"), col("clean_id"), col("dist"))
  }

  /** The default block key for [[fuzzyMatch]]: the name's first token. */
  def firstTokenBlock(name: Column): Column =
    coalesce(split(name, " ").getItem(0), lit(""))

  /**
   * The scaladoc design rule of [[fuzzyMatch]] ("key cardinality must
   * grow with the data") made executable: how many hex characters of a
   * stable suffix the block key needs so the EXPECTED block population
   * stays at `targetPerBlock`, given `catalogRows` and the cardinality
   * the rest of the key already contributes (`baseCardinality`, e.g.
   * the ~25-word first-token vocabulary). Each hex char multiplies key
   * cardinality by 16, so the width is log₁₆ of the required blow-up —
   * O(1) driver arithmetic off one `count()`.
   *
   * Clamped to [minHex, maxHex]: the lower bound keeps small-corpus
   * blocks honest (and keeps the sf0.01 oracle byte-stable at width 4);
   * the upper bound must leave the prefix strictly inside the
   * characters the expected corruption cannot touch (7 of the 8-hex
   * suffix here — the corruption model mutates the final character).
   */
  def suffixPrefixWidth(catalogRows: Long, baseCardinality: Long,
                        targetPerBlock: Long = 4,
                        minHex: Int = 4, maxHex: Int = 7): Int = {
    require(catalogRows >= 0 && baseCardinality > 0 && targetPerBlock > 0,
      "catalogRows >= 0, baseCardinality > 0, targetPerBlock > 0")
    val need = catalogRows.toDouble / (baseCardinality.toDouble * targetPerBlock)
    val w = if (need <= 1) minHex
      else math.ceil(math.log(need) / math.log(16)).toInt
    math.min(maxHex, math.max(minHex, w))
  }
}
