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
   * stable column, not arrival order. One shuffle on the group key; the
   * within-group cumulative sum sorts only within partitions.
   */
  def tokenBudget(df: DataFrame, groupCol: Column, idCol: Column,
                  tokensCol: Column, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(idCol.asc)
    df.withColumn("__cum", sum(tokensCol).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /**
   * Deterministic shard assembly for training-data writes: shard = hash
   * bucket of the id, position = rank of a SECOND, independent hash
   * within the shard — a stable pseudo-shuffle (training wants documents
   * decorrelated from their natural order, and wants the same shard
   * layout on every rerun). Write with `partitionBy("shard")` sorted by
   * `shard_pos`; one shuffle on the shard key, rank sorts only within
   * shards.
   */
  def shardAssignment(df: DataFrame, idCol: Column, nShards: Int): DataFrame = {
    val order = pmod(conv(substring(md5(concat(lit("pos_"), idCol.cast("string"))), 1, 15), 16, 10)
      .cast(LongType), lit(1000000007L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(order.asc, idCol.asc)
    df.withColumn("shard", bucket(idCol, nShards))
      .withColumn("shard_pos", row_number().over(w).cast(LongType) - 1)
  }
}
