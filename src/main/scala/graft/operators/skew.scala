package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for the 100 TB case. AQE's skew-join splitting
 * handles most hot keys automatically; `saltedJoin` is the explicit tool
 * for the pathological ones (a handful of keys holding a large fraction of
 * all rows — nulls, defaults, power-law heads) where even a split shuffle
 * partition is one-key-bound.
 */
object Skew {

  /**
   * Salted equi-join of a skewed `big` side against a `small` side:
   * big rows get a random salt in [0, salts); small rows are replicated
   * `salts` times; the join key becomes (key, salt), spreading each hot
   * key over `salts` shuffle partitions. Semantics identical to
   * `big.join(small, key)` for inner joins.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, seed: Long = 42L): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(pmod(hash(col(key), monotonically_increasing_id(), lit(seed)), lit(salts))
        + lit(salts), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key report: the top-k heaviest keys and their share of all rows —
    * the measurement that decides whether salting is needed. */
  def hotKeys(df: DataFrame, key: Column, k: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(key.as("key")).count()
      .orderBy(col("count").desc).limit(k)
      .withColumn("share", round(col("count") / lit(total.toDouble), 4))
  }
}
