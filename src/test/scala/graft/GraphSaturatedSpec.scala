package graft

/** The saturated-cluster profile dial must be a pure PERFORMANCE knob:
  * plans built under spark.graft.clusterSaturated=true (shared edge
  * subplans persisted) return row-identical results to the default
  * idle profile (persist-free parallel recompute).
  */
class GraphSaturatedSpec extends GraftSpec {

  private def bothProfiles(name: String): (Seq[String], Seq[String]) = {
    val q = SparkEntry.queries(name)
    spark.conf.set("spark.graft.clusterSaturated", "false")
    val idle = q(spark, sf).collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.clusterSaturated", "true")
    try {
      val sat = q(spark, sf).collect().map(_.toString).sorted.toSeq
      (idle, sat)
    } finally {
      spark.conf.set("spark.graft.clusterSaturated", "false")
      spark.catalog.clearCache()
    }
  }

  for (name <- Seq("graph_pagerank", "graph_triangles", "graph_kcore",
      "graph_basket_rules", "graph_hits"))
    test(s"$name: saturated profile is result-identical to idle") {
      val (idle, sat) = bothProfiles(name)
      assert(idle.nonEmpty)
      assert(idle == sat)
    }

  test("auto profile (the round-19 default) resolves from MEASURED " +
      "fact volume and stays result-identical on both sides of the " +
      "threshold") {
    // graph_kcore: its 27-ref doubled-arc subplan still routes through
    // saturatedSlot. (graph_pagerank no longer does — the round-23
    // LayoutCache edge table replaced the shared-subplan persist for
    // the base edge list, so pagerank's plan has nothing to persist.)
    val q = SparkEntry.queries("graph_kcore")
    spark.conf.set("spark.graft.clusterSaturated", "false")
    val idle = q(spark, sf).collect().map(_.toString).sorted.toSeq
    try {
      val rows = Tables.parquetRowCount(spark, sf, "lineitem")
      assert(rows > 0L, "footer row count must be readable")
      spark.conf.set("spark.graft.clusterSaturated", "auto")
      // side 1: threshold above the measured volume → idle shape
      // (nothing persisted)
      spark.conf.set("spark.graft.saturatedAutoRows",
        (rows + 1L).toString)
      spark.catalog.clearCache()
      assert(q(spark, sf).collect().map(_.toString).sorted.toSeq == idle)
      assert(spark.sharedState.cacheManager.isEmpty,
        "idle side of the auto dial must not persist")
      // side 2: threshold at/below the measured volume → persist
      // engages WITHOUT operator action, rows stay identical
      spark.conf.set("spark.graft.saturatedAutoRows", rows.toString)
      assert(q(spark, sf).collect().map(_.toString).sorted.toSeq == idle)
      assert(!spark.sharedState.cacheManager.isEmpty,
        "saturated side of the auto dial must persist the edge subplan")
    } finally {
      spark.conf.set("spark.graft.clusterSaturated", "false")
      spark.conf.unset("spark.graft.saturatedAutoRows")
      spark.catalog.clearCache()
    }
  }

  test("parquetRowCount reads exact counts from footers alone and " +
      "memoizes") {
    val exact = Tables(spark, sf, "lineitem").count()
    assert(Tables.parquetRowCount(spark, sf, "lineitem") == exact)
    assert(Tables.parquetRowCount(spark, sf, "lineitem") == exact)
  }
}
