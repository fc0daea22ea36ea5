package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the SCALE.md shuffle-elimination claim,
  * demonstrated: both sides bucketed on the join key join with zero
  * Exchange operators in the executed plan. */
class BucketingSpec extends GraftSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    val db = "graft_bktest"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      val orders = (1L to 1000L).map(i => (i, i % 7)).toDF("o_orderkey", "o_status")
      val items = (1L to 5000L).map(i => (i % 1000 + 1, i)).toDF("l_orderkey", "l_item")
      orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable(s"$db.orders_b")
      items.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable(s"$db.items_b")

      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(s"$db.orders_b")
        .join(spark.table(s"$db.items_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 5000L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
