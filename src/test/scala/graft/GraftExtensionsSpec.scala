package graft

import org.apache.spark.sql.SparkSession

/** The extensions-config path a cluster deploy uses: a FRESH session
  * built with spark.sql.extensions=graft.GraftExtensions resolves every
  * graft function in plain SQL with no runtime register() call.
  */
class GraftExtensionsSpec extends GraftSpec {

  test("spark.sql.extensions injects all graft functions") {
    // `spark.sql.extensions` is static config read from the
    // SparkContext, which the shared test context was built without —
    // use the builder's programmatic withExtensions (the same class a
    // cluster names in --conf) on a fresh session over the same context
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = s2.sql(
        """SELECT
          |  simhash64(array('a b', 'b c')) AS sh,
          |  cosine_f32(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
          |  intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ic,
          |  size(ngram_hashes(array('a', 'b', 'c'), 2)) AS ng
          |""".stripMargin).head
      assert(row.getAs[Double]("cos") == 1.0)
      assert(row.getAs[Long]("ic") == 2L)
      assert(row.getAs[Int]("ng") == 2)
      // round-6 injections: phash + the bloom/CMS sketch pairs compose
      // in pure SQL through the same extensions hook
      val sk = s2.sql(
        """WITH d AS (SELECT array(1L, 2L, 3L) AS hs, 'a' AS k
          |  UNION ALL SELECT array(4L, 5L) AS hs, 'a' AS k)
          |SELECT
          |  bloom_any(bloom_agg(hs, 256, 2), array(3L), 256, 2) AS hit,
          |  bloom_any(bloom_agg(hs, 256, 2), array(99L), 256, 2)
          |    AS probably_not,
          |  cms_est(cms_agg(k, 64, 4), 'a', 64, 4) AS cnt,
          |  phash64('abcdefgh') <=> phash64('abcdefgh') AS stable
          |FROM d""".stripMargin).head
      assert(sk.getAs[Boolean]("hit"))
      assert(sk.getAs[Long]("cnt") == 2L)
      assert(sk.getAs[Boolean]("stable"))
      val kmv = s2.sql(
        """SELECT kmv_distinct(hs, 64) AS est FROM
          |  (SELECT array(1L, 2L, 3L) AS hs UNION ALL
          |   SELECT array(3L, 4L) AS hs)""".stripMargin).head
      assert(kmv.getAs[Double]("est") == 4.0) // < k => exact count
      val mg = s2.sql(
        """SELECT mg_topk(t, 2) AS cands FROM
          |  (SELECT explode(array('a','a','a','b','c','a','b')) AS t)"""
          .stripMargin).head.getSeq[String](0)
      assert(mg.contains("a")) // freq 4 > N/k = 3.5 => guaranteed
      // round-14 injection: the quantile digest reads through pure SQL
      val qd = s2.sql(
        """SELECT qdigest_quantile(v, 0.5) AS p50 FROM
          |  (SELECT explode(sequence(1L, 10L)) AS v)""".stripMargin).head
      assert(qd.getAs[Long]("p50") == 5L) // exact below 16
      // dim-table auto-broadcast: with size-based broadcast disabled, a
      // plain customer x nation join must STILL plan a BroadcastHashJoin
      // because the injected rule recognizes the dim signature
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Tables(s2, sf, "customer")
        .join(Tables(s2, sf, "nation"),
          org.apache.spark.sql.functions.col("c_nationkey") ===
            org.apache.spark.sql.functions.col("n_nationkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"dim auto-broadcast missing:\n$plan")
      // the size gate: with the cap below nation's file size, the
      // column-name signature alone must NOT force the broadcast (a
      // terabyte denormalized extract carrying dim key names stays on
      // the normal planner path)
      s2.conf.set("spark.graft.dimBroadcastMaxBytes", "1")
      try {
        val gatedPlan = Tables(s2, sf, "customer")
          .join(Tables(s2, sf, "nation"),
            org.apache.spark.sql.functions.col("c_nationkey") ===
              org.apache.spark.sql.functions.col("n_nationkey"))
          .queryExecution.executedPlan.toString
        assert(!gatedPlan.contains("BroadcastHashJoin"),
          s"size gate ignored:\n$gatedPlan")
      } finally {
        s2.conf.set("spark.graft.dimBroadcastMaxBytes",
          (256L * 1024 * 1024).toString)
      }
      // and the un-extended shared session must NOT broadcast under the
      // same threshold (proves the rule, not statistics, did it)
      val prevShared = shared.conf.get("spark.sql.autoBroadcastJoinThreshold")
      shared.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plainPlan = Tables(shared, sf, "customer")
          .join(Tables(shared, sf, "nation"),
            org.apache.spark.sql.functions.col("c_nationkey") ===
              org.apache.spark.sql.functions.col("n_nationkey"))
          .queryExecution.executedPlan.toString
        assert(!plainPlan.contains("BroadcastHashJoin"))
      } finally {
        shared.conf.set("spark.sql.autoBroadcastJoinThreshold", prevShared)
      }
    } finally {
      // the shared TestSpark session must stay usable for other suites
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("approxCountDistinct flag rewrites COUNT(DISTINCT) to the KMV sketch") {
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-approx-test")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val q = "SELECT source, COUNT(DISTINCT lang) AS n FROM documents GROUP BY source"
      Tables(s2, sf, "documents").createOrReplaceTempView("documents")
      // flag off: untouched exact plan, no sketch
      val exactPlan = s2.sql(q).queryExecution.optimizedPlan.toString
      assert(!exactPlan.contains("kmv"), s"rewrite fired while off:\n$exactPlan")
      val exact = s2.sql(q).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

      s2.conf.set("spark.graft.approxCountDistinct", "true")
      val rewritten = s2.sql(q)
      val optPlan = rewritten.queryExecution.optimizedPlan.toString
      assert(optPlan.contains("kmv"), s"rewrite missing:\n$optPlan")
      // distinct langs per source << k: the sketch is in its exact
      // regime, so the rewritten query returns the EXACT counts (and
      // the schema keeps the bigint column the exact plan had)
      val approx = rewritten.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx == exact)

      // multi-column distinct is left alone even with the flag on
      val multi = s2.sql(
        "SELECT COUNT(DISTINCT source, lang) AS n FROM documents")
      assert(!multi.queryExecution.optimizedPlan.toString.contains("kmv"))
    } finally {
      s2.conf.set("spark.graft.approxCountDistinct", "false")
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
