package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Deterministic, engine-portable sampling for training-data pipelines.
 *
 * `sample()`/RNG-based sampling is irreproducible across engines, runs,
 * and repartitions; pipelines that must be re-runnable (and auditable —
 * "which rows were in the training set?") sample by a content hash
 * instead: a row is kept iff md5(id) mod 10000 falls under the threshold.
 * Same rows selected at any scale, any partitioning, any engine (the
 * DuckDB oracle replays the identical predicate). Skew-free as long as
 * ids are unique, codegen'd end-to-end, and pushes down past column
 * pruning like any other filter.
 */
object Sampling {

  /** Engine-portable hash bucket in [0, buckets): Spark
    * `conv(substring(md5(x),1,15),16,10)` ≡ DuckDB
    * `('0x' || substr(md5(x),1,15))::BIGINT` (60-bit, positive). */
  def bucket(idCol: Column, buckets: Int = 10000): Column =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10)
      .cast(LongType), lit(buckets.toLong))

  /** Keep ~`fraction` of rows, deterministically by id. */
  def hashSample(df: DataFrame, idCol: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(bucket(idCol) < lit((fraction * 10000).round))
  }

  /** Stratified variant: per-stratum sampling fractions (data-mixture
    * weighting over a source/language column), `default` elsewhere. */
  def stratifiedHashSample(df: DataFrame, strataCol: Column, idCol: Column,
                           fractions: Map[String, Double],
                           default: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit((default * 10000).round)) {
      case (acc, (k, f)) => when(strataCol === k, lit((f * 10000).round)).otherwise(acc)
    }
    df.filter(bucket(idCol) < threshold)
  }

  /**
   * Weighted up/down-sampling (epoch weighting in a data mixture): each
   * row is emitted floor(w) times plus one more with probability frac(w),
   * decided by the row's hash bucket — deterministic at any scale or
   * partitioning, unlike RNG resampling. Appends `copy_id` (0-based) so
   * replicas stay distinct downstream. w < 1 down-samples, w > 1
   * up-samples; generator-shaped (explode), so output size follows the
   * weights with no driver involvement.
   */
  def weightedResample(df: DataFrame, idCol: Column, weight: Column): DataFrame = {
    val copies = floor(weight).cast(LongType) +
      when(bucket(idCol) < (weight - floor(weight)) * 10000, 1L).otherwise(0L)
    df.withColumn("copy_id",
      explode(when(copies > 0, sequence(lit(0L), copies - 1))
        .otherwise(array().cast("array<bigint>"))))
  }

  /**
   * Token-budget selection: per group (source/language), keep rows in
   * ascending `idCol` order while the running token total (inclusive)
   * stays within `budget` — the "take the first N tokens of each source"
   * step of mixture construction, reproducible because the order is a
   * stable column, not arrival order.
   *
   * Scale shape — a two-phase prefix sum, NOT one window per group (that
   * put a whole source on one task: ~20 TB/task with 5 sources at
   * 100 TB). Each group is cut into `nBlocks` ordered id-range blocks
   * (equal-width over the group's [min, max] id — min/max are
   * order-independent aggregates, so both plan branches below compute
   * identical bounds; balance is perfect for dense ids and degrades only
   * to imbalance, never incorrectness, for clustered ones). Phase 1
   * aggregates one token subtotal per (group, block) and turns it into
   * per-block cumulative offsets — a window over the TINY subtotal
   * table only. Phase 2 broadcast-joins the offsets back and computes
   * the running sum inside each bounded (group, block) partition, so
   * parallelism is #groups * nBlocks and no task ever holds a full
   * group. Blocks whose offset already exceeds the budget are dropped
   * before the sort — at 100 TB with a fixed budget that prunes almost
   * everything (requires non-negative token counts, true by
   * construction).
   *
   * `idCol` must be numeric (the block cut is range arithmetic).
   */
  def tokenBudget(df: DataFrame, groupCol: Column, idCol: Column,
                  tokensCol: Column, budget: Long, nBlocks: Int = 64): DataFrame = {
    require(nBlocks > 0, "nBlocks must be positive")
    val outCols = df.columns.map(col)
    // per-group id range; deterministic under any partitioning, so the
    // two consumers of `blocked` below agree on every block boundary
    val bounds = df.groupBy(groupCol.as("__g"))
      .agg(min(idCol).as("__mn"), max(idCol).as("__mx"))
    // monotone in idCol (IEEE multiply/divide by positive constants are
    // order-preserving), so blocks are ordered id ranges within the group
    val blk = least(
      floor((idCol.cast("double") - col("__mn").cast("double")) * nBlocks /
        (col("__mx").cast("double") - col("__mn").cast("double") + 1.0)).cast(LongType),
      lit(nBlocks - 1L))
    val blocked = df.join(broadcast(bounds), groupCol <=> col("__g"))
      .withColumn("__blk", blk)
    // phase 1: one row per (group, block); the cumulative window runs
    // over at most #groups * nBlocks rows
    val offsets = blocked.groupBy(col("__g").as("__g2"), col("__blk").as("__blk2"))
      .agg(sum(tokensCol).as("__sub"))
      .withColumn("__off", coalesce(
        sum(col("__sub")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__g2")).orderBy(col("__blk2").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__g2"), col("__blk2"), col("__off"))
    // phase 2: bounded per-(group, block) running sum + block-level prune
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g"), col("__blk")).orderBy(idCol.asc)
    blocked
      .join(broadcast(offsets), col("__g") <=> col("__g2") && col("__blk") === col("__blk2"))
      .filter(col("__off") <= budget)
      .withColumn("__cum", col("__off") + sum(tokensCol).over(wLoc))
      .filter(col("__cum") <= budget)
      .select(outCols: _*)
  }

  /**
   * Deterministic shard assembly for training-data writes: shard = hash
   * bucket of the id, position = rank of a SECOND, independent hash
   * within the shard — a stable pseudo-shuffle (training wants documents
   * decorrelated from their natural order, and wants the same shard
   * layout on every rerun). Write with `partitionBy("shard")` sorted by
   * `shard_pos`; one shuffle on the shard key.
   *
   * Scale shape — same two-phase rank as [[tokenBudget]]: the order hash
   * is uniform in [0, 1e9+7) by construction, so each shard is cut into
   * `nBlocks` FIXED-width hash ranges (deterministic and balanced with
   * no data statistics at all); per-(shard, block) counts become
   * cumulative offsets via a window over the tiny count table, and
   * `row_number` runs only inside a (shard, block) — parallelism is
   * nShards * nBlocks instead of one task sorting a whole shard.
   */
  def shardAssignment(df: DataFrame, idCol: Column, nShards: Int,
                      nBlocks: Int = 64): DataFrame = {
    require(nBlocks > 0, "nBlocks must be positive")
    // cap the offset table at ~4M cells: with many shards, fewer blocks
    // per shard still gives ample parallelism (nShards * blocks tasks)
    val blocks = math.max(1, math.min(nBlocks, (1 << 22) / math.max(1, nShards)))
    val P = 1000000007L
    val order = pmod(conv(substring(md5(concat(lit("pos_"), idCol.cast("string"))), 1, 15), 16, 10)
      .cast(LongType), lit(P))
    // ord < 1e9+7, blocks <= ~4M: ord * blocks < 2^53, so the double
    // division is monotone and consistent across both phases; the clamp
    // absorbs any boundary rounding
    val blk = least(floor(order * blocks / P).cast(LongType), lit(blocks - 1L))
    val blocked = df.withColumn("shard", bucket(idCol, nShards))
      .withColumn("__ord", order)
      .withColumn("__blk", blk)
    // phase 1: per-(shard, block) counts — a tiny partial-aggregated
    // count (nShards * blocks cells), collected once at build time; both
    // phases derive shard/block from the same pure hash of the id, so
    // they agree under any partitioning. Offsets become an O(1)-indexed
    // array literal: no join, no second exchange in the data path.
    val counts = blocked.groupBy(col("shard"), col("__blk"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getLong(0) * blocks + r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toMap
    val offArr = new Array[Long](nShards * blocks)
    var s = 0
    while (s < nShards) {
      var acc = 0L; var b = 0
      while (b < blocks) {
        offArr(s * blocks + b) = acc
        acc += counts.getOrElse(s.toLong * blocks + b, 0L)
        b += 1
      }
      s += 1
    }
    // phase 2: rank only inside a (shard, block) — bounded partitions
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("__blk")).orderBy(col("__ord").asc, idCol.asc)
    blocked
      .withColumn("__off", element_at(typedlit(offArr),
        (col("shard") * blocks + col("__blk") + 1).cast("int")))
      .withColumn("shard_pos", col("__off") + row_number().over(wLoc).cast(LongType) - 1)
      .select(df.columns.map(col) :+ col("shard") :+ col("shard_pos"): _*)
  }
}
