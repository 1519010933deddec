package graft

import org.apache.spark.sql.functions._
import graft.operators.Zenith

/** Invariant specs for the round-11 additions (#220+). Value-level
  * correctness is the DuckDB oracle's job (tools/check.py); these pin
  * the accounting identities, bound contracts, and the probe-dial
  * superset property that must be PROVED rather than eyeballed.
  */
class ZenithSpec extends GraftSpec {

  test("events_lifecycle: activity partitions into new/retained/" +
      "resurrected and churn balances the prior week's actives") {
    val l = Zenith.eventsLifecycle(spark, sf).cache()
    assert(l.count() > 0)
    assert(l.where(col("n_active") =!=
      col("n_new") + col("n_retained") + col("n_resurrected")).count() == 0)
    // active(w-1) users either stay (retained in w) or lapse (churned
    // into w): n_churned(w) + n_retained(w) == n_active(w-1) wherever
    // week w-1 exists
    val prev = l.select((col("week") + 1).as("week"),
      col("n_active").as("prev_active"))
    assert(l.join(prev, "week")
      .where(col("n_churned") + col("n_retained") =!= col("prev_active"))
      .count() == 0)
    // week 1 of the log is all-new
    val first = l.orderBy("week").limit(1).head()
    assert(first.getAs[Long]("n_new") == first.getAs[Long]("n_active"))
    l.unpersist()
  }

  test("orders_supplier_leadtime: days are sane and rates bounded") {
    val s = Zenith.ordersSupplierLeadtime(spark, sf).cache()
    assert(s.count() > 0)
    // the synthetic generator ships a few lines BEFORE the order date,
    // so min_days may be negative — assert ordering, not positivity
    assert(s.where(col("min_days") > col("max_days")).count() == 0)
    // mean sits inside [min, max] (r4 slack)
    assert(s.where(col("avg_days") < col("min_days") - 0.001 ||
      col("avg_days") > col("max_days") + 0.001).count() == 0)
    assert(s.where(col("n_slow") > col("n_lines")).count() == 0)
    assert(s.where(col("slow_rate") < 0 || col("slow_rate") > 1)
      .count() == 0)
    s.unpersist()
  }

  test("supplier_hhi: concentration bounded by 1/n and 1") {
    val h = Zenith.supplierHhi(spark, sf).cache()
    assert(h.count() > 0)
    assert(h.where(col("hhi") >
      lit(1.0) + 0.001).count() == 0)
    assert(h.where(col("hhi") <
      lit(1.0) / col("n_suppliers") - 0.001).count() == 0)
    h.unpersist()
  }

  test("orders_basket_profile: shares form a distribution over all orders") {
    val b = Zenith.ordersBasketProfile(spark, sf).cache()
    val nOrders = Tables(spark, sf, "lineitem")
      .select("l_orderkey").distinct().count()
    assert(b.agg(sum("n_orders")).head().getLong(0) == nOrders)
    val shareSum = b.agg(sum("order_share")).head().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 0.01, s"share sum $shareSum")
    // an order has at least as many items as distinct parts
    assert(b.where(col("avg_parts") > col("n_items") + 0.001).count() == 0)
    b.unpersist()
  }

  test("events_interarrival: order statistics are consistent and gap " +
      "counts match the log") {
    val g = Zenith.eventsInterarrival(spark, sf).cache()
    assert(g.count() > 0)
    assert(g.where(col("p50_gap_us") > col("max_gap_us")).count() == 0)
    assert(g.where(col("mean_gap_us") > col("max_gap_us") + 0.001)
      .count() == 0)
    // n_gaps = per-type event count - 1 (every type here has >= 2 events)
    val n = Tables.eventsUs(spark, sf).groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
    assert(g.join(n, "event_type")
      .where(col("n_gaps") =!= col("n_events") - 1).count() == 0)
    g.unpersist()
  }

  test("corpus_novelty: the corpus opener is fully novel, fractions are " +
      "bounded, and novel chunks partition the chunk-type space") {
    val nv = Zenith.corpusNovelty(spark, sf).cache()
    assert(nv.count() > 0)
    assert(nv.where(col("novelty") < 0 || col("novelty") > 1).count() == 0)
    assert(nv.where(col("n_novel") > col("n_chunks")).count() == 0)
    val first = nv.orderBy("doc_id").limit(1).head()
    assert(first.getAs[Long]("n_novel") == first.getAs[Long]("n_chunks"),
      "the first doc in doc_id order must be 100% novel")
    // every chunk type is novel in exactly one doc: sum(n_novel) equals
    // the number of distinct chunk types in the corpus
    val totalNovel = nv.agg(sum("n_novel")).head().getLong(0)
    val types = Tables(spark, sf, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(explode(expr(
        """CASE WHEN size(toks) >= 8 THEN
          |  transform(sequence(1, size(toks) div 8),
          |    i -> md5(concat_ws(' ', slice(toks, (i - 1) * 8 + 1, 8))))
          |ELSE array() END""".stripMargin)).as("ph"))
      .select("ph").distinct().count()
    assert(totalNovel == types, s"$totalNovel novel vs $types types")
    nv.unpersist()
  }

  test("dedup_source_matrix: overlap bounded by the smaller side and " +
      "pairs are canonically ordered") {
    val m = Zenith.dedupSourceMatrix(spark, sf).cache()
    assert(m.count() > 0)
    assert(m.where(col("source_a") >= col("source_b")).count() == 0)
    assert(m.where(col("n_shared") > least(col("na"), col("nb")))
      .count() == 0)
    assert(m.where(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    m.unpersist()
  }

  test("embed_centroid_sim: one row per label pair, cosine in [-1, 1]") {
    val c = Zenith.embedCentroidSim(spark, sf).cache()
    val nLabels = Tables(spark, sf, "embeddings")
      .select("label").distinct().count()
    assert(c.count() == nLabels * (nLabels - 1) / 2)
    assert(c.where(col("cos_centroid") < -1.001 ||
      col("cos_centroid") > 1.001).count() == 0)
    c.unpersist()
  }

  test("ann_probe_dial: multi-probe dominates single-probe in both " +
      "recall and cost, and overlaps never exceed truth") {
    val d = Zenith.annProbeDial(spark, sf).cache()
    assert(d.count() > 0)
    assert(d.where(col("n_cand_multi") < col("n_cand_single")).count() == 0,
      "the multi-probe candidate set must contain the single-probe set")
    assert(d.where(col("recall_multi") < col("recall_single") - 0.0001)
      .count() == 0, "more probes can never lose recall")
    assert(d.where(col("n_overlap_single") > col("n_truth") ||
      col("n_overlap_multi") > col("n_truth")).count() == 0)
    d.unpersist()
  }

  test("corpus_dup_profile: distinct counts nest (norm merges at least " +
      "what exact merges) and rates are bounded") {
    val p = Zenith.corpusDupProfile(spark, sf).cache()
    assert(p.count() > 0)
    assert(p.where(col("n_exact") > col("n_docs")).count() == 0)
    assert(p.where(col("n_norm") > col("n_exact")).count() == 0)
    assert(p.where(col("exact_dup_rate") < 0 || col("exact_dup_rate") > 1 ||
      col("norm_dup_rate") < 0 || col("norm_dup_rate") > 1).count() == 0)
    assert(p.where(col("norm_dup_rate") < col("exact_dup_rate") - 0.0001)
      .count() == 0, "normalization can only merge more")
    p.unpersist()
  }

  test("orders_discount_lift: the zero-discount bucket is its own " +
      "baseline and buckets cover every line") {
    val l = Zenith.ordersDiscountLift(spark, sf).cache()
    val zero = l.where(col("disc_pct") === 0)
    assert(zero.count() == 1)
    assert(math.abs(zero.head().getAs[Double]("qty_lift") - 1.0) < 0.0001)
    val nLines = Tables(spark, sf, "lineitem").count()
    assert(l.agg(sum("n_lines")).head().getLong(0) == nLines)
    l.unpersist()
  }

  test("embed_dim_moments: moments are consistent per dimension") {
    val m = Zenith.embedDimMoments(spark, sf).cache()
    val nVecs = Tables(spark, sf, "embeddings")
      .where(col("embedding").isNotNull).count()
    assert(m.where(col("n") =!= nVecs).count() == 0)
    assert(m.where(col("var_x") < -0.0001).count() == 0)
    assert(m.where(col("mean_x") < col("min_x") - 0.001 ||
      col("mean_x") > col("max_x") + 0.001).count() == 0)
    m.unpersist()
  }

  test("graph_hits: top-20 by authority, and authority dominates the " +
      "squared buyer count (h1(u) >= a1(p) for every buyer of p)") {
    val h = Zenith.graphHits(spark, sf).cache()
    assert(h.count() == 20)
    assert(h.where(col("authority") <
      col("n_buyers") * col("n_buyers")).count() == 0)
    val rows = h.select("authority").collect().map(_.getLong(0)).toSeq
    assert(rows == rows.sorted.reverse, "not sorted by authority desc")
    h.unpersist()
  }

  test("quality_calibration: ten near-equal deciles covering every " +
      "scored doc, rates bounded") {
    val c = Zenith.qualityCalibration(spark, sf).cache()
    assert(c.count() == 10)
    assert(c.where(col("keep_rate") < 0 || col("keep_rate") > 1)
      .count() == 0)
    val sizes = c.select("n").collect().map(_.getLong(0))
    assert(sizes.max - sizes.min <= 1, "ntile deciles must differ by <= 1")
    // decile score ranges are disjoint and ordered
    val byDecile = c.orderBy("decile").collect()
    byDecile.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_w") <= b.getAs[Long]("min_w"))
    }
    c.unpersist()
  }

  test("dedup_banding_sweep: candidate and verified sets nest as bands " +
      "loosen (2x8 subset of 4x4 subset of 8x2)") {
    val s = Zenith.dedupBandingSweep(spark, sf).orderBy("n_bands")
      .collect()
    assert(s.length == 3)
    assert(s.map(_.getAs[Long]("n_bands")).toSeq == Seq(2L, 4L, 8L))
    // a full-signature match implies every half matches: candidates
    // (and therefore verified pairs) are monotone in the band count
    val cand = s.map(_.getAs[Long]("n_candidates"))
    val ver = s.map(_.getAs[Long]("n_verified"))
    assert(cand(0) <= cand(1) && cand(1) <= cand(2), cand.toSeq.toString)
    assert(ver(0) <= ver(1) && ver(1) <= ver(2), ver.toSeq.toString)
    assert(s.forall(r => r.getAs[Long]("n_verified") <=
      r.getAs[Long]("n_candidates")))
  }

  test("embed_label_consistency: bounded rates and at most k edges per " +
      "vector") {
    val c = Zenith.embedLabelConsistency(spark, sf).cache()
    assert(c.count() > 0)
    assert(c.where(col("consistency") < 0 || col("consistency") > 1)
      .count() == 0)
    assert(c.where(col("n_same") > col("n_edges")).count() == 0)
    assert(c.where(col("n_edges") > lit(3L) * col("n_vectors"))
      .count() == 0, "the kNN graph emits at most k = 3 edges per vector")
    c.unpersist()
  }

  test("corpus_pack_efficiency: fill and crossing rates bounded, " +
      "capacity covers the stream") {
    val p = Zenith.corpusPackEfficiency(spark, sf).cache()
    assert(p.count() > 0)
    assert(p.where(col("fill_rate") <= 0 || col("fill_rate") > 1.0001)
      .count() == 0)
    assert(p.where(col("crossing_rate") < 0 || col("crossing_rate") > 1)
      .count() == 0)
    assert(p.where(col("total_tokens") > col("n_chunks") * 2048L)
      .count() == 0)
    p.unpersist()
  }

  test("cdc_merge_apply: merged row count and action counts match the " +
      "synthesized change batch exactly") {
    val m = Zenith.cdcMergeApply(spark, sf).cache()
    val keys = Tables(spark, sf, "orders").select("o_orderkey").cache()
    val nBase = keys.count()
    val nDel = keys.where(col("o_orderkey") % 11 === 0).count()
    val nUpd = keys.where(col("o_orderkey") % 7 === 0 &&
      col("o_orderkey") % 11 =!= 0).count()
    val nIns = keys.where(col("o_orderkey") % 13 === 0).count()
    assert(m.agg(sum("n_rows")).head().getLong(0) == nBase - nDel + nIns)
    assert(m.agg(sum("n_updated")).head().getLong(0) == nUpd)
    assert(m.agg(sum("n_inserted")).head().getLong(0) == nIns)
    keys.unpersist(); m.unpersist()
  }

  test("ann_ivf_balance: cells partition the cloud and balance ratios " +
      "average to 1") {
    val b = Zenith.annIvfBalance(spark, sf).cache()
    val nVecs = Tables(spark, sf, "embeddings").count()
    assert(b.agg(sum("n_vecs")).head().getLong(0) == nVecs)
    assert(b.where(col("balance_ratio") <= 0).count() == 0)
    val ratioSum = b.agg(sum("balance_ratio")).head().getDouble(0)
    assert(math.abs(ratioSum - 8.0) < 0.01, s"ratio sum $ratioSum")
    b.unpersist()
  }

  test("mix_achieved_shares: epochs are positive integers, the largest " +
      "source never upsamples, and both share columns are distributions") {
    val s = Zenith.mixAchievedShares(spark, sf).cache()
    assert(s.count() > 0)
    assert(s.where(col("epochs") < 1).count() == 0)
    val top = s.orderBy(desc("n_tokens")).limit(1).head()
    assert(top.getAs[Long]("epochs") == 1L,
      "the max-token source has upsample <= 1, so it rounds to one epoch")
    val t = s.agg(sum("target_share")).head().getDouble(0)
    val a = s.agg(sum("achieved_share")).head().getDouble(0)
    assert(math.abs(t - 1.0) < 0.01 && math.abs(a - 1.0) < 0.01)
    s.unpersist()
  }

  test("decontamination_report: covers both methods' flags, verdicts " +
      "partition, no unflagged rows") {
    val r = Zenith.decontaminationReport(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.where(!col("exact_hit") && !col("fuzzy_hit")).count() == 0)
    val nExact = operators.Corpus.decontaminate(spark, sf).count()
    assert(r.where(col("exact_hit")).count() == nExact)
    assert(r.where(col("verdict") === "both" &&
      !(col("exact_hit") && col("fuzzy_hit"))).count() == 0)
    assert(r.where(col("verdict") === "exact_only" && col("fuzzy_hit"))
      .count() == 0)
    assert(r.where(col("verdict") === "fuzzy_only" && col("exact_hit"))
      .count() == 0)
    r.unpersist()
  }

  test("graph_local_clustering: coefficients bounded, per-node triangle " +
      "counts sum to three times the global census") {
    val c = Zenith.graphLocalClustering(spark, sf).cache()
    assert(c.count() > 0)
    assert(c.where(col("local_cc") < 0 || col("local_cc") > 1.0001)
      .count() == 0)
    assert(c.where(col("deg") < 2).count() == 0)
    val triSum = c.agg(sum("n_tri")).head().getLong(0)
    val global = operators.Graph.graphTriangles(spark, sf)
      .head().getAs[Long]("n_triangles")
    assert(triSum == 3 * global,
      s"per-node triangle corners $triSum != 3 x $global")
    c.unpersist()
  }

  test("orders_reorder_interval: order statistics consistent, gaps " +
      "non-negative") {
    val r = Zenith.ordersReorderInterval(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.where(col("p50_days") < 0).count() == 0)
    assert(r.where(col("p50_days") > col("max_days")).count() == 0)
    assert(r.where(col("mean_days") > col("max_days") + 0.001)
      .count() == 0)
    r.unpersist()
  }

  test("window_rolling_slope: full windows only; slope recomputes from " +
      "an independent per-window collect on one spot-checked nation") {
    val s = Zenith.windowRollingSlope(spark, sf).cache()
    assert(s.count() > 0)
    // every (nation, mo) appears at most once and months advance
    val dup = s.groupBy("n_name", "mo").count().where(col("count") > 1)
    assert(dup.count() == 0)
    // spot-check: recompute one window's slope brute-force
    val one = s.limit(1).head()
    val nat = one.getAs[String]("n_name")
    val mo = one.getAs[Int]("mo")
    val monthly = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .where(col("n_name") === nat)
      .groupBy(expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
        .as("mo"))
      .agg(sum(col("o_totalprice").cast("decimal(38,2)"))
        .cast("double").as("rev"))
      .where(col("mo") <= mo).orderBy(desc("mo")).limit(6)
      .collect().map(r => (r.getAs[Int]("mo").toDouble,
        r.getAs[Double]("rev")))
    assert(monthly.length == 6)
    val n = 6.0
    val sx = monthly.map(_._1).sum; val sy = monthly.map(_._2).sum
    val sxy = monthly.map(t => t._1 * t._2).sum
    val sxx = monthly.map(t => t._1 * t._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(one.getAs[Double]("slope") - slope) < 0.01,
      s"engine ${one.getAs[Double]("slope")} vs recomputed $slope")
    s.unpersist()
  }

  test("agg_weighted_median: the weighted median covers half the " +
      "quantity mass on each side") {
    val m = Zenith.aggWeightedMedian(spark, sf).cache()
    assert(m.count() > 0)
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("w"))
    for (row <- m.collect()) {
      val flag = row.getAs[String]("flag")
      val wm = row.getAs[Double]("wmedian_price")
      val below = li.where(col("flag") === flag &&
        col("price") < wm - 0.0001).agg(sum("w")).head().getLong(0)
      val tot = row.getAs[Long]("tot_qty")
      assert(2 * below < tot + 1,
        s"$flag: strictly-below mass $below exceeds half of $tot")
    }
    m.unpersist()
  }

  test("corpus_length_drift: halves partition each source and the ratio " +
      "recomputes from the means") {
    val d = Zenith.corpusLengthDrift(spark, sf).cache()
    assert(d.count() > 0)
    val nDocs = Tables(spark, sf, "documents")
      .where(col("text").isNotNull).count()
    assert(d.agg(sum(col("n_early") + col("n_late"))).head().getLong(0)
      == nDocs)
    // ratio ~= mean_late / mean_early within r4 rounding
    assert(d.where(abs(col("len_ratio") -
      col("mean_len_late") / col("mean_len_early")) > 0.01).count() == 0)
    d.unpersist()
  }

  test("orders_seasonal_index: twelve months, indices average to 1") {
    val s = Zenith.ordersSeasonalIndex(spark, sf).cache()
    assert(s.count() == 12)
    val mean = s.agg(avg("seasonal_index")).head().getDouble(0)
    assert(math.abs(mean - 1.0) < 0.01, s"index mean $mean")
    s.unpersist()
  }

  test("graph_avg_neighbor_degree: bounded by the graph's extreme " +
      "degrees") {
    val a = Zenith.graphAvgNeighborDegree(spark, sf).cache()
    assert(a.count() > 0)
    val degs = a.agg(min("deg"), max("deg")).head()
    val (dmin, dmax) = (degs.getLong(0), degs.getLong(1))
    assert(a.where(col("avg_nbr_deg") < dmin - 0.001 ||
      col("avg_nbr_deg") > dmax + 0.001).count() == 0)
    a.unpersist()
  }

  test("ts_decompose: components reconstruct the series and residuals " +
      "average to ~0 within each seasonal cell") {
    val t = Zenith.tsDecompose(spark, sf).cache()
    assert(t.count() > 0)
    // y = trend + seasonal + resid up to the three r4 roundings
    assert(t.where(abs(col("c") - col("trend") - col("seasonal") -
      col("resid")) > 0.001).count() == 0)
    // the seasonal mean absorbs the cell's detrended level: per-cell
    // residual means vanish up to r4 rounding
    val cells = t
      .withColumn("dow", expr("(hr div 24) % 7"))
      .withColumn("hod", expr("hr % 24"))
      .groupBy("event_type", "dow", "hod")
      .agg(avg("resid").as("m"))
    assert(cells.where(abs(col("m")) > 0.001).count() == 0)
    t.unpersist()
  }
}
