package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-stable loaders for the driver-generated testdata tables.
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)` and loads
  * through here, so path handling / nanos-timestamp quirks are fixed in
  * one place. Modeled on the reference catalog's collections
  * (jobs / files / events — see /root/reference/reactor.py:119-218):
  * `events` is the job event log, `documents` the archived outputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read it as raw epoch-nanos longs instead (exact, no
    * truncation — a ns→us cast would lose sub-microsecond order).
    */
  private def nanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") nanosAsLong(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Loader for COMPUTE-HEAVY consumers: the testdata parquets are
    * single-row-group files, so the scan (and any expensive map-side
    * expression chained on it) would otherwise run as ONE task. A
    * round-robin repartition to the default parallelism costs one
    * narrow shuffle of the raw rows and buys full-core signature /
    * vector compute. On a real cluster the scan splits by row groups
    * and this is a no-op-sized rebalance.
    */
  def spread(spark: SparkSession, dir: String, name: String): DataFrame =
    apply(spark, dir, name)
      .repartition(spark.sparkContext.defaultParallelism)

  /** Register every table as a temp view for spark.sql(...) use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** `events` with the nanos ts canonicalized to epoch MICROSECONDS
    * (`ts_us`). The DuckDB oracle reads the same parquet but truncates
    * TIMESTAMP(NANOS) to its microsecond TIMESTAMP, so every oracle'd
    * event query must compare/order/emit at micro precision on BOTH
    * sides (`ts div 1000` here == `epoch_us(ts)` there). Raw `ts` is
    * dropped on purpose so no query accidentally uses nano precision.
    */
  def eventsUs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    apply(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .drop("ts")
  }
}
