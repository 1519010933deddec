package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{Pinnacle, Temporal}

/** Invariant specs for the round-12 additions (#249+). Value-level
  * correctness is the DuckDB oracle's job (tools/check.py); these pin
  * the threshold/exclusion/tolerance contracts that must be PROVED
  * rather than eyeballed.
  */
class PinnacleSpec extends GraftSpec {

  test("q11_important_stock: kept parts are exactly those above 1/1000 " +
      "of the nation total, and the cut is decimal-exact") {
    val out = Pinnacle.q11ImportantStock(spark, sf).cache()
    // recompute the unthresholded grouped table independently
    val supp = Tables(spark, sf, "supplier")
      .join(Tables(spark, sf, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .where(col("n_name") === "NATION_3")
      .select("s_suppkey")
    val v = Tables(spark, sf, "lineitem")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(22, 6))).as("value_dec"))
      .cache()
    val total = v.agg(sum("value_dec")).head().getDecimal(0)
    val expected = v.where(col("value_dec") * 1000 > lit(total)).count()
    assert(out.count() == expected && expected > 0)
    // every emitted value clears the threshold (double view, r4 slack)
    val minKept = out.agg(min("value")).head().getDouble(0)
    assert(minKept * 1000.0 > total.doubleValue() * 0.999)
    v.unpersist(); out.unpersist()
  }

  test("q16_parts_supplier: counts bounded by the clean supplier pool " +
      "and groups satisfy the attribute filters") {
    val out = Pinnacle.q16PartsSupplier(spark, sf).cache()
    assert(out.count() > 0)
    val nClean = Tables(spark, sf, "supplier")
      .where(col("s_acctbal") >= 0).count()
    assert(out.where(col("supplier_cnt") < 1 ||
      col("supplier_cnt") > nClean).count() == 0)
    assert(out.where(col("p_brand") === "Brand#3" ||
      col("p_type").like("ECO%") ||
      !col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)).count() == 0)
    out.unpersist()
  }

  test("join_asof_tolerance: exactly the asof matches within 24h, " +
      "same picked view, non-negative gap") {
    val tol = Pinnacle.joinAsofTolerance(spark, sf).cache()
    val base = Temporal.joinAsOf(spark, sf).cache()
    assert(tol.count() > 0)
    assert(tol.where(col("gap_us") < 0 ||
      col("gap_us") > 86400000000L).count() == 0)
    assert(tol.where(col("gap_us") =!=
      col("ts_us") - col("view_ts_us")).count() == 0)
    // tolerance output == base asof filtered to the 24h gap, row for row
    val baseFiltered = base.where(
      col("ts_us") - col("view_ts_us") <= 86400000000L)
    assert(baseFiltered.count() == tol.count())
    assert(tol.select("event_id", "view_event_id")
      .except(baseFiltered.select("event_id", "view_event_id"))
      .count() == 0)
    tol.unpersist(); base.unpersist()
  }

  test("ann_filtered: every neighbor shares the query's label and " +
      "ranks are contiguous") {
    val out = operators.Pinnacle.annFiltered(spark, sf).cache()
    assert(out.count() > 0)
    val lbl = Tables(spark, sf, "embeddings")
      .select(col("vec_id").as("c_id"), col("label").as("c_label"))
    assert(out.join(lbl, "c_id")
      .where(col("label") =!= col("c_label")).count() == 0)
    assert(out.where(col("cosine") < -1.0001 ||
      col("cosine") > 1.0001).count() == 0)
    // ranks per query are 1..n with no holes
    val bad = out.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .where(col("n") =!= col("mx") || col("mx") > 3)
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("ann_rerank: shortlist containment, exact-cosine ordering, and " +
      "the exact pass never beats brute force") {
    val rr = operators.Pinnacle.annRerank(spark, sf).cache()
    assert(rr.count() > 0)
    assert(rr.where(col("rank_q") < 1 || col("rank_q") > 20).count() == 0)
    // within each query, final ranking is by descending exact cosine
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy("rank")
    assert(rr.withColumn("prev", lag("cosine", 1).over(w))
      .where(col("prev").isNotNull && col("cosine") > col("prev") + 0.0001)
      .count() == 0)
    // brute-force top-1 is an upper bound for the reranked top-1
    val bf1 = operators.Similarity.annBruteforce(spark, sf)
      .where(col("rank") === 1)
      .select(col("q_id"), col("cosine").as("bf_cos"))
    assert(rr.where(col("rank") === 1).join(bf1, "q_id")
      .where(col("cosine") > col("bf_cos") + 0.0001).count() == 0)
    rr.unpersist()
  }

  test("agg_sketch_union: merged and direct union sketches are " +
      "IDENTICAL (the mergeability lattice property)") {
    val s = operators.Pinnacle.aggSketchUnion(spark, sf).cache()
    val m = s.where(col("scope") === "union_merged").head()
    val d = s.where(col("scope") === "union_direct").head()
    assert(m.getAs[Long]("sketch_size") == d.getAs[Long]("sketch_size"))
    assert(m.getAs[Any]("kth_hv") == d.getAs[Any]("kth_hv"))
    assert(m.getAs[Double]("estimate") == d.getAs[Double]("estimate"))
    // per-type sketches are bounded by k
    assert(s.where(col("sketch_size") > 64).count() == 0)
    s.unpersist()
  }

  test("events_burstiness: gap accounting and class thresholds cohere") {
    val b = operators.Pinnacle.eventsBurstiness(spark, sf).cache()
    assert(b.count() > 0)
    assert(b.where(col("n_gaps") =!= col("n_events") - 1).count() == 0)
    assert(b.where(col("cv2") < -0.0001).count() == 0)
    assert(b.where(col("arrival_class") === "bursty" &&
      col("cv2") < 1.5 - 0.001).count() == 0)
    assert(b.where(col("arrival_class") === "regular" &&
      col("cv2") > 0.5 + 0.001).count() == 0)
    b.unpersist()
  }

  test("quality_rule_overlap: co-fire bounded by both margins, " +
      "jaccard in [0,1], all 6 pairs present") {
    val o = operators.Pinnacle.qualityRuleOverlap(spark, sf).cache()
    assert(o.count() == 6)
    assert(o.where(col("n_both") > col("n_a") ||
      col("n_both") > col("n_b")).count() == 0)
    assert(o.where(col("jaccard").isNotNull &&
      (col("jaccard") < 0 || col("jaccard") > 1)).count() == 0)
    o.unpersist()
  }

  test("ts_cusum: one row per type, totals reconcile, change point " +
      "inside the observed series") {
    val c = operators.Pinnacle.tsCusum(spark, sf).cache()
    val raw = Tables.eventsUs(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n_raw"))
    assert(c.count() == raw.count())
    assert(c.join(raw, "event_type")
      .where(col("total_events") =!= col("n_raw")).count() == 0)
    val span = Tables.eventsUs(spark, sf)
      .groupBy("event_type")
      .agg(expr("min(ts_us div 3600000000)").as("h_min"),
        expr("max(ts_us div 3600000000)").as("h_max"))
    assert(c.join(span, "event_type")
      .where(col("cp_hour") < col("h_min") ||
        col("cp_hour") > col("h_max")).count() == 0)
    c.unpersist()
  }

  test("events_entropy_rate: integer-bits entropy bounded, rate row " +
      "reconciles with per-state totals") {
    val e = operators.Pinnacle.eventsEntropyRate(spark, sf).cache()
    assert(e.count() > 1)
    assert(e.where(col("ent_bits") < -0.0001).count() == 0)
    // H_bits <= bits(n_trans) (the device's hard ceiling)
    assert(e.where(col("ent_bits") >
      (length(bin(col("n_trans"))) - 1).cast("double") + 0.0001)
      .count() == 0)
    val rate = e.where(col("src") === "__rate").head()
    val per = e.where(col("src") =!= "__rate")
      .agg(sum("n_trans")).head().getLong(0)
    assert(rate.getAs[Long]("n_trans") == per)
    e.unpersist()
  }

  test("sessions_concurrency: every session covered at least once, " +
      "users bounded by sessions") {
    val c = operators.Pinnacle.sessionsConcurrency(spark, sf).cache()
    assert(c.count() > 0)
    assert(c.where(col("n_users") > col("n_sessions") ||
      col("n_sessions") < 1).count() == 0)
    // total session-hours >= total sessions (each spans >= 1 hour)
    val nSessions = operators.Temporal.sessionize(spark, sf).count()
    val sessHours = c.agg(sum("n_sessions")).head().getLong(0)
    assert(sessHours >= nSessions)
    c.unpersist()
  }

  test("embed_pq_usage: per-subspace accounting against the corpus, " +
      "utilization and entropy bounded") {
    val u = operators.Pinnacle.embedPqUsage(spark, sf).cache()
    assert(u.count() == 2) // m = 2 subspaces
    val nVecs = Tables(spark, sf, "embeddings").count()
    assert(u.where(col("n_vecs") =!= nVecs).count() == 0)
    assert(u.where(col("n_used") < 1 || col("n_used") > 16).count() == 0)
    assert(u.where(col("utilization") <= 0 ||
      col("utilization") > 1).count() == 0)
    assert(u.where(col("top_code_share") <= 0 ||
      col("top_code_share") > 1).count() == 0)
    // 16 codewords => at most 4 bits of code entropy
    assert(u.where(col("code_ent_bits") < -0.0001 ||
      col("code_ent_bits") > 4.0001).count() == 0)
    u.unpersist()
  }

  test("events_ab_srm: arm counts reconcile and the flag matches the " +
      "exact integer comparison") {
    val r = operators.Pinnacle.eventsAbSrm(spark, sf).head()
    val nUsers = Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na + nb == nUsers && r.getAs[Long]("n_users") == nUsers)
    assert(r.getAs[Boolean]("srm_flag") ==
      ((na - nb) * (na - nb) > 9 * (na + nb)))
    assert(r.getAs[Double]("z2") >= 0.0)
  }
}
