package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession builder — the one place session-level scale knobs
  * live (SURVEY.md §4).
  *
  * AQE is on for runtime shuffle coalescing and skew-join splitting;
  * shuffle partitions default to the local core count (a cluster deploy
  * overrides via --conf, and AQE re-coalesces anyway); UTC timezone so
  * timestamp math is environment-independent; graft's native function
  * suite is registered up front.
  */
object GraftSession {

  def apply(
      cores: Int = Runtime.getRuntime.availableProcessors,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // coalesce by size, not core count: tiny post-shuffle partitions
      // collapse to few tasks instead of splintering across all cores
      // (at cluster scale the size target dominates either way)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime (bloom) filters: a selective predicate on one side of a
      // shuffle join builds a bloom filter that pre-filters the other
      // side's scan — the 100 TB win is skipping fact rows before the
      // Exchange. Size thresholds gate it, so local runs are unaffected;
      // GraftExtensionsSpec drops the thresholds and asserts the rewrite
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.Hashes.register(spark)
    spark
  }
}
