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
}
