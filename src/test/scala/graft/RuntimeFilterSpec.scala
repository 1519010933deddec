package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter injection (GraftSession enables
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`): a selective
  * filter on the small side of a shuffle join should build a bloom
  * filter that pre-filters the fact side's scan BEFORE its Exchange —
  * at 100 TB that's the difference between shuffling every fact row and
  * shuffling only probable matches. Size thresholds gate the rewrite in
  * production; this spec drops them to force it at test scale and
  * asserts both the injection and answer equivalence.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("selective dim filter injects a bloom filter on the fact scan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val l = Tables(spark, sf, "lineitem")
        .select("l_orderkey", "l_extendedprice")
      val o = Tables(spark, sf, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom filter injected:\n$plan")
      // the rewrite is a pure pre-filter: answer must equal the plain join
      val n = joined.count()
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(n == l.join(o, col("l_orderkey") === col("o_orderkey")).count())
      assert(n > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
