package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the 100 TB story for repeated fact-fact
  * joins: both sides pre-bucketed on the join key join WITHOUT any
  * shuffle exchange. Asserted on the physical plan, not assumed.
  */
class BucketingSpec extends GraftSpec {

  test("pre-bucketed orders x lineitem join plans zero exchanges") {
    // disable broadcast so the join strategy is decided by bucketing,
    // not by the tiny test-data sizes
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, sf, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables(spark, sf, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must be exchange-free: the only allowed
      // exchange is the final single-column groupBy
      val joinPart = plan.split("HashAggregate").last
      assert(joinPart.contains("SortMergeJoin"), s"no SMJ in:\n$plan")
      assert(!joinPart.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it must produce the same result as the plain join
      val expected = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
