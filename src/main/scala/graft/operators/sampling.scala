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
}
