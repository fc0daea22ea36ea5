package graft

import org.apache.spark.sql.functions._

/** The documented 100 TB swaps for q_profile / q_vocab are real code, not
  * comments: approximate aggregates must (a) plan as partial+final hash
  * aggregates (the mergeable-sketch property that lets them scale where
  * exact percentile/count-distinct cannot), and (b) land within tolerance
  * of the exact answers on the oracle corpus. */
class ApproxSpec extends GraftSpec {

  private lazy val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")

  test("percentile_approx tracks exact percentile per source (mergeable sketch)") {
    val exact = docs.groupBy("source")
      .agg(expr("percentile(n_chars, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approxDf = docs.groupBy("source")
      .agg(percentile_approx(col("n_chars"), lit(0.5), lit(1000)).as("p50"))
    val approx = approxDf
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, e) =>
      assert(math.abs(approx(src) - e) / e <= 0.05,
        s"$src: approx ${approx(src)} vs exact $e drifts > 5%")
    }
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(plan.contains("partial_percentile_approx"),
      s"approx percentile must partial-aggregate map-side:\n$plan")
  }

  test("approx_count_distinct tracks exact vocabulary size (HLL sketch)") {
    val tokens = docs.select(col("source"),
      explode(split(lower(col("text")), "\\s+")).as("token"))
    val exact = tokens.groupBy("source").agg(countDistinct("token").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approxDf = tokens.groupBy("source")
      .agg(approx_count_distinct(col("token"), 0.02).as("v"))
    val approx = approxDf
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (src, e) =>
      assert(math.abs(approx(src).toDouble - e) / e <= 0.05,
        s"$src: approx ${approx(src)} vs exact $e drifts > 5%")
    }
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      s"HLL must partial-aggregate map-side:\n$plan")
    // and, unlike exact countDistinct, no Expand/double-shuffle plan
    assert(!plan.contains("Expand"), s"HLL should not need Expand:\n$plan")
  }
}
