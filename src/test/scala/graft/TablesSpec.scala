package graft

/** Schema contract for the driver-generated tables: every loader returns
  * the expected columns, and the nanos-timestamp workaround holds.
  */
class TablesSpec extends GraftSpec {

  val expectedCols: Map[String, Set[String]] = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  for ((name, cols) <- expectedCols)
    test(s"$name has expected columns") {
      assert(cols.subsetOf(Tables(spark, sf, name).columns.toSet))
    }

  test("all tables load and are non-empty") {
    for (n <- Tables.names)
      assert(Tables(spark, sf, n).count() > 0, s"table $n is empty")
  }

  test("eventsUs exposes micro-precision ts and drops raw nanos") {
    val ev = Tables.eventsUs(spark, sf)
    assert(ev.columns.contains("ts_us"))
    assert(!ev.columns.contains("ts"))
    val Array(min, max) = ev.selectExpr("min(ts_us)", "max(ts_us)")
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    // sane epoch-microsecond range (2020..2030)
    assert(min > 1577836800000000L && max < 1893456000000000L)
  }

  test("persistSlot keeps the shared cache entry on repeated same-plan calls") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    def isCached(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.withCachedData.exists(_.isInstanceOf[InMemoryRelation])
    def build() = Tables(spark, sf, "region").selectExpr("r_regionkey * 2 as k")
    val first = Tables.persistSlot("spec.sameplan", build())
    first.count()
    assert(isCached(first), "first persistSlot call must cache")
    // Second call with the SAME plan: CacheManager returns the existing
    // entry; the slot swap must NOT evict it (the r5 bug evicted here
    // because `prev ne cached` even though both share one cache entry).
    val second = Tables.persistSlot("spec.sameplan", build())
    second.count()
    assert(isCached(second), "same-plan re-persist must stay cached")
    assert(isCached(build()), "shared cache entry must survive the slot swap")
    // A genuinely different plan in the slot evicts the old occupant.
    val third = Tables.persistSlot("spec.sameplan",
      Tables(spark, sf, "region").selectExpr("r_regionkey * 3 as k"))
    third.count()
    assert(isCached(third))
    assert(!isCached(build()), "different-plan swap must evict the previous occupant")
    third.unpersist(blocking = true)
  }

  test("embeddings are fixed 64-dim vectors") {
    import org.apache.spark.sql.functions._
    val dims = Tables(spark, sf, "embeddings")
      .select(size(col("embedding")).as("d")).distinct().collect()
    assert(dims.map(_.getInt(0)).toSeq == Seq(64))
  }

  test("spread repartitions low-split inputs but adds NO exchange when " +
      "the scan already yields enough splits") {
    def hasExchange(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Exchange")
    // the testdata parquets are single-row-group single files: the scan
    // is one split, so spread must keep its historical repartition
    assert(hasExchange(Tables.spread(spark, sf, "documents")),
      "single-split input must still be round-robin spread")
    // a multi-file table whose scan splits >= defaultParallelism: with
    // tiny split/open thresholds every file is its own split, the
    // cluster-scale shape — spread must NOT add a shuffle (r12 verdict
    // item 8)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_spec_spread").toString
    try {
      Tables(spark, sf, "region")
        .repartition(spark.sparkContext.defaultParallelism * 2)
        .write.mode("overwrite").parquet(s"$tmp/region.parquet")
      val oldMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val oldOpen = spark.conf.get("spark.sql.files.openCostInBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      try {
        val df = Tables.spread(spark, tmp, "region")
        assert(df.rdd.getNumPartitions
          >= spark.sparkContext.defaultParallelism)
        assert(!hasExchange(df),
          "multi-split scan must not pay the narrow shuffle")
        // content identical to the plain read either way
        assert(df.count() == Tables(spark, tmp, "region").count())
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", oldMax)
        spark.conf.set("spark.sql.files.openCostInBytes", oldOpen)
      }
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      try walk
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
