package graft

import org.apache.spark.sql.functions._
import graft.operators.Horizon

/** Invariant specs for the round-9 additions (#174-176). Value-level
  * correctness is the DuckDB oracle's job (tools/check.py); these pin
  * the structural and semantic contracts.
  */
class HorizonSpec extends GraftSpec {

  test("q12_shipmode: only MAIL/SHIP; high+low == independent late count") {
    val q = Horizon.q12Shipmode(spark, sf)
    val rows = q.collect()
    assert(rows.nonEmpty && rows.length <= 2)
    assert(rows.forall(r => Set("MAIL", "SHIP")(r.getString(0))))
    // independent recount of late MAIL/SHIP lines (mode derived the
    // same way, lateness the #128 convention)
    val l = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"),
        pmod(col("l_suppkey") + col("l_linenumber"), lit(5)).as("m"))
      .where(col("m").isin(0, 1)) // MAIL=0, SHIP=1 in the mode array
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    val late = l.join(o, col("l_orderkey") === col("o_orderkey") &&
      col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total == late.count())
  }

  test("text_entropy: per-doc bounds and the single-token-doc zero") {
    val e = Horizon.textEntropy(spark, sf).cache()
    val docs = Tables(spark, sf, "documents")
    assert(e.count() == docs.count())
    // 0 <= ent_bits <= bits(n_tokens); n_distinct <= n_tokens
    assert(e.where(col("ent_bits") < 0 ||
      col("n_distinct") > col("n_tokens") ||
      col("ent_bits") > (length(bin(col("n_tokens"))) - 1)).count() == 0)
    // a doc of ONE distinct token has exactly zero entropy, and any
    // doc with >1 distinct token has strictly positive entropy iff the
    // bits() floor distinguishes its counts from N (>= 0 always)
    assert(e.where(col("n_distinct") === 1 && col("ent_bits") =!= 0.0)
      .count() == 0)
    e.unpersist()
  }

  test("text_entropy: all-distinct doc scores bits(N) exactly") {
    // synthetic check straight through the same arithmetic: for an
    // all-distinct doc every c_i = 1, so sum_cbits = 0 and
    // ent_bits = bits(N) — the column's documented ceiling
    val e = Horizon.textEntropy(spark, sf)
    val allDistinct = e.where(col("n_distinct") === col("n_tokens"))
    assert(allDistinct.where(col("ent_bits") =!=
      (length(bin(col("n_tokens"))) - 1).cast("double")).count() == 0)
  }

  test("quality_ensemble: each rank column is a permutation of 1..n") {
    val q = Horizon.qualityEnsemble(spark, sf).cache()
    val n = q.count()
    assert(n > 0)
    for (c <- Seq("r_len", "r_div", "r_rep", "final_rank")) {
      val d = q.agg(
        countDistinct(col(c)).as("nd"),
        min(col(c)).as("lo"), max(col(c)).as("hi")).head()
      assert(d.getLong(0) == n && d.getLong(1) == 1L && d.getLong(2) == n,
        s"$c is not a permutation of 1..$n: $d")
    }
    // borda bounds: [3, 3n]
    assert(q.where(col("borda") < 3 || col("borda") > 3 * n).count() == 0)
    q.unpersist()
  }

  test("corpus_epoch_plan: cap respected; biggest source is the 1-epoch " +
      "anchor; unique_frac == 1/epochs") {
    val p = operators.Horizon.corpusEpochPlan(spark, sf).cache()
    assert(p.where(col("epochs") < 1 || col("epochs") > 4).count() == 0)
    // the budget-setting source repeats exactly once
    val top = p.orderBy(desc("n_tokens")).limit(1).head()
    assert(top.getAs[Long]("epochs") == 1L &&
      top.getAs[Long]("planned_tokens") == top.getAs[Long]("n_tokens"))
    // planned = epochs * tokens, and unique_frac is exactly r4(1/epochs)
    assert(p.where(col("planned_tokens") =!=
      col("epochs") * col("n_tokens")).count() == 0)
    assert(p.where(col("unique_frac") =!=
      graft.Exprs.r4(lit(1.0) / col("epochs"))).count() == 0)
    // achieved shares sum to ~1 (each share is r4'd: |sources|·1e-4 slack)
    val s = p.agg(sum("share")).head().getDouble(0)
    assert(math.abs(s - 1.0) < 2e-3, s"shares sum to $s")
    p.unpersist()
  }

  test("ts_acf: 3 lags per type, |acf| <= 1, pair counts shrink with lag") {
    val a = operators.Horizon.tsAcf(spark, sf).cache()
    val types = Tables(spark, sf, "events")
      .select("event_type").distinct().count()
    assert(a.count() == 3 * types)
    assert(a.where(abs(col("acf")) > 1.0 + 1e-9).count() == 0)
    // the dense axis loses exactly one pair per extra lag step
    val byLag = a.groupBy("event_type")
      .agg((max("n") - min("n")).as("spread")).where(col("spread") =!= 2L)
    assert(byLag.count() == 0)
    a.unpersist()
  }

  test("dedup_minhash_est: err is |est - exact|, both in [0,1], and the " +
      "estimate is calibrated on high-similarity pairs") {
    val e = operators.Horizon.dedupMinhashEst(spark, sf).cache()
    assert(e.count() > 0)
    assert(e.where(col("est_jaccard") < 0 || col("est_jaccard") > 1 ||
      col("exact_jaccard") < 0 || col("exact_jaccard") > 1).count() == 0)
    assert(e.where(col("id_a") >= col("id_b")).count() == 0)
    // abs_err recomputes (up to the two r4 grids: 1e-4 slack)
    assert(e.where(abs(col("abs_err") -
      abs(col("est_jaccard") - col("exact_jaccard"))) > 2e-4).count() == 0)
    // identical shingle sets must estimate exactly 1 (same md5 minima)
    assert(e.where(col("exact_jaccard") === 1.0 &&
      col("est_jaccard") =!= 1.0).count() == 0)
    e.unpersist()
  }

  test("graph_bfs: 5 landmark roots at hop 0; hops within [0,3]; every " +
      "hop-1 node is adjacent to a landmark") {
    val b = operators.Horizon.graphBfs(spark, sf).cache()
    assert(b.where(col("hop") < 0 || col("hop") > 3).count() == 0)
    val roots = b.where(col("hop") === 0).orderBy("node")
      .collect().map(_.getLong(0))
    assert(roots.length == 5)
    // the roots ARE the 5 smallest nodes of the edge list (recompute
    // the support-floored co-purchase edges the Graph family shares)
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val und = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(countDistinct(col("a.o")).as("sup"))
      .where(col("sup") >= 2)
      .select("pa", "pb")
    val nodes = und.select(col("pa").as("n"))
      .union(und.select(col("pb").as("n"))).distinct()
    val smallest = nodes.orderBy("n").limit(5).collect().map(_.getLong(0))
    assert(roots.sameElements(smallest))
    // hop-1 nodes each share an edge with some root
    val rootSet = roots.toSet
    val adj = und.where(
        (col("pa").isin(rootSet.toSeq: _*)) ||
        (col("pb").isin(rootSet.toSeq: _*)))
      .select(col("pa").as("n")).union(und.where(
        (col("pa").isin(rootSet.toSeq: _*)) ||
        (col("pb").isin(rootSet.toSeq: _*)))
        .select(col("pb").as("n")))
      .distinct().collect().map(_.getLong(0)).toSet
    val hop1 = b.where(col("hop") === 1).collect().map(_.getLong(0))
    assert(hop1.forall(adj.contains), "a hop-1 node is not root-adjacent")
    b.unpersist()
  }

  test("embed_dim_stats: one row per dimension; order stats are ordered") {
    val s = operators.Horizon.embedDimStats(spark, sf).cache()
    val dims = Tables(spark, sf, "embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    assert(s.count() == dims)
    // min <= p05 <= p50 <= p95 <= max on every row, none null
    assert(s.where(col("min_x").isNull || col("p05").isNull ||
      col("p50").isNull || col("p95").isNull || col("max_x").isNull)
      .count() == 0)
    assert(s.where(col("min_x") > col("p05") || col("p05") > col("p50") ||
      col("p50") > col("p95") || col("p95") > col("max_x")).count() == 0)
    // n = corpus size for every dim (dense vectors)
    val nvecs = Tables(spark, sf, "embeddings").count()
    assert(s.where(col("n") =!= nvecs).count() == 0)
    s.unpersist()
  }

  test("sample_fixed_k: exactly k per source, ranks 1..k, repeatable") {
    val a = operators.Horizon.sampleFixedK(spark, sf)
    val b = operators.Horizon.sampleFixedK(spark, sf)
    val sizes = a.groupBy("source").agg(count(lit(1)).as("c"),
      min("r").as("lo"), max("r").as("hi"))
    assert(sizes.where(col("c") =!= 10L || col("lo") =!= 1L ||
      col("hi") =!= 10L).count() == 0)
    // deterministic: two invocations agree row-for-row
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("events_dispersion: flag agrees with the r4'd statistic; mean " +
      "consistent with totals") {
    val d = operators.Horizon.eventsDispersion(spark, sf).cache()
    assert(d.count() > 0)
    // integer flag vs rounded statistic can only disagree inside the
    // r4 grid around 1.0
    assert(d.where(col("overdispersed") && col("dispersion") < 1.0 - 1e-4)
      .count() == 0)
    assert(d.where(!col("overdispersed") && col("dispersion") > 1.0 + 1e-4)
      .count() == 0)
    // mean_rate recomputes from total / n_hours
    assert(d.where(abs(col("mean_rate") -
      col("total").cast("double") / col("n_hours")) > 1e-4).count() == 0)
    d.unpersist()
  }

  test("ts_cross_corr: full pair-lag grid; |r| <= 1; pair count shrinks " +
      "by |lag|") {
    val x = operators.Horizon.tsCrossCorr(spark, sf).cache()
    val types = Tables(spark, sf, "events")
      .select("event_type").distinct().count()
    assert(x.count() == types * (types - 1) / 2 * 5)
    assert(x.where(abs(col("xcorr")) > 1.0 + 1e-9).count() == 0)
    // n at lag L is (global span + 1) - |L| for every pair
    val bad = x.groupBy("type_a", "type_b")
      .agg(max("n").as("n0"))
      .join(x, Seq("type_a", "type_b"))
      .where(col("n") =!= col("n0") - abs(col("lag")))
    assert(bad.count() == 0)
    x.unpersist()
  }

  test("text_source_jaccard: all source pairs; inter bounded by set sizes") {
    val j = operators.Horizon.textSourceJaccard(spark, sf).cache()
    val srcs = Tables(spark, sf, "documents")
      .select("source").distinct().count()
    assert(j.count() == srcs * (srcs - 1) / 2)
    assert(j.where(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    assert(j.where(col("inter") > least(col("na"), col("nb"))).count() == 0)
    // recompute jaccard from the integer columns (same r4 grid)
    assert(j.where(abs(col("jaccard") - col("inter").cast("double") /
      (col("na") + col("nb") - col("inter"))) > 1e-4).count() == 0)
    j.unpersist()
  }

  test("mix_curriculum: positions are a schedule — scores descend, " +
      "cumulative tokens reach the corpus total") {
    val c = operators.Horizon.mixCurriculum(spark, sf).cache()
    val n = c.count()
    assert(n > 0)
    val d = c.agg(countDistinct("position").as("nd"),
      min("position").as("lo"), max("position").as("hi")).head()
    assert(d.getLong(0) == n && d.getLong(1) == 1L && d.getLong(2) == n)
    // scores never increase along the schedule
    val w = org.apache.spark.sql.expressions.Window.orderBy("position")
    val inc = c.withColumn("prev", lag("score", 1).over(w))
      .where(col("prev").isNotNull && col("score") > col("prev"))
    assert(inc.count() == 0)
    // the last cumulative share is exactly 1.0 (total/total under r4)
    val last = c.orderBy(desc("position")).limit(1).head()
    assert(last.getAs[Double]("cum_share") == 1.0)
    c.unpersist()
  }

  test("ann_mmr: position 1 is the plain nearest neighbor; selections " +
      "are distinct; greedy objective never increases") {
    val m = operators.Horizon.annMmr(spark, sf).cache()
    // 3 positions per query, all distinct candidates
    val per = m.groupBy("q_id").agg(count(lit(1)).as("c"),
      countDistinct("c_id").as("d"))
    assert(per.where(col("c") =!= 3L || col("d") =!= 3L).count() == 0)
    // position 1 == ann_bruteforce rank 1 (same query set, same tie rule)
    val bf1 = operators.Similarity.queries("ann_bruteforce")(spark, sf)
      .where(col("rank") === 1).select(col("q_id"), col("c_id").as("bf_id"))
    val p1 = m.where(col("position") === 1).select("q_id", "c_id")
    assert(p1.join(bf1, "q_id").where(col("c_id") =!= col("bf_id"))
      .count() == 0)
    // the greedy objective is non-increasing across positions (r4 slack)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy("position")
    val inc = m.withColumn("prev", lag("score", 1).over(w))
      .where(col("prev").isNotNull && col("score") > col("prev") + 2e-4)
    assert(inc.count() == 0)
    m.unpersist()
  }

  test("dedup_threshold_sweep: yield curve is monotone in the threshold") {
    val s = operators.Horizon.dedupThresholdSweep(spark, sf).cache()
    assert(s.count() == 5)
    val w = org.apache.spark.sql.expressions.Window.orderBy("threshold")
    val bad = s
      .withColumn("pp", lag("n_pairs", 1).over(w))
      .withColumn("pd", lag("n_docs", 1).over(w))
      .where(col("pp").isNotNull &&
        (col("n_pairs") > col("pp") || col("n_docs") > col("pd")))
    assert(bad.count() == 0)
    // a pair touches at most 2 docs
    assert(s.where(col("n_docs") > col("n_pairs") * 2).count() == 0)
    s.unpersist()
  }

  test("events_user_overlap: full pair grid; intersection bounded") {
    val o = operators.Horizon.eventsUserOverlap(spark, sf).cache()
    val types = Tables(spark, sf, "events")
      .select("event_type").distinct().count()
    assert(o.count() == types * (types - 1) / 2)
    assert(o.where(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    assert(o.where(col("inter") > least(col("na"), col("nb"))).count() == 0)
    o.unpersist()
  }

  test("embed_label_drift: one row per (>=2)-vector label; halves " +
      "partition the population; cosine bounded") {
    val d = operators.Horizon.embedLabelDrift(spark, sf).cache()
    val byLabel = Tables(spark, sf, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("n")).where(col("n") >= 2)
    assert(d.count() == byLabel.count())
    val j = d.join(byLabel, "label")
    // n_early = floor(n/2), halves partition
    assert(j.where(col("n_early") + col("n_late") =!= col("n") ||
      col("n_early") =!= expr("n div 2")).count() == 0)
    assert(d.where(abs(col("cos_drift")) > 1.0 + 1e-9).count() == 0)
    // NOTE: this synthetic corpus's labels are NOT tight clusters —
    // half-centroid sums are noise-dominated, so cos_drift sits well
    // below 1 here (measured ~[-0.3, 0.5]); the spec pins determinism
    // and a true-positive: a label made STATIONARY by construction
    // (duplicating its vectors across both halves) must read ≈ 1.
    val again = operators.Horizon.embedLabelDrift(spark, sf)
    assert(d.exceptAll(again).count() == 0 &&
      again.exceptAll(d).count() == 0)
    d.unpersist()
  }

  test("embed_label_drift: stationary label reads 1.0, orthogonal " +
      "shift reads 0.0") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_drift").toString
    def v(i: Int): Array[Float] = {
      val a = Array.fill(4)(0.0f); a(i) = 1.0f; a
    }
    // label 0: late half repeats the early half's vectors → cos 1
    // label 1: early on axis 0, late on axis 1 → cos 0
    val rows = Seq(
      (1L, v(0), 0), (2L, v(1), 0), (3L, v(0), 0), (4L, v(1), 0),
      (10L, v(0), 1), (11L, v(0), 1), (12L, v(1), 1), (13L, v(1), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val d = operators.Horizon.embedLabelDrift(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(d(0) == 1.0, s"stationary label drifted: ${d(0)}")
    assert(d(1) == 0.0, s"orthogonal shift not detected: ${d(1)}")
  }

  test("text_script_profile: per-source fractions partition the chars") {
    val p = operators.Horizon.textScriptProfile(spark, sf).cache()
    val srcs = Tables(spark, sf, "documents")
      .select("source").distinct().count()
    assert(p.count() == srcs)
    // the four fractions sum to 1 within the stacked r4 grids
    assert(p.where(abs(col("letter_frac") + col("digit_frac") +
      col("space_frac") + col("other_frac") - 1.0) > 4e-4).count() == 0)
    // this corpus is tokenized lowercase text: letters dominate
    assert(p.where(col("letter_frac") < 0.5).count() == 0)
    p.unpersist()
  }

  test("window_rolling_median: every order emits; single-order " +
      "customers are their own median") {
    val m = operators.Horizon.windowRollingMedian(spark, sf).cache()
    val orders = Tables(spark, sf, "orders")
    assert(m.count() == orders.count())
    val singles = orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("c")).where(col("c") === 1)
    val j = m.join(singles, "o_custkey")
      .join(orders.select("o_orderkey", "o_totalprice"), "o_orderkey")
    assert(j.where(col("rolling_median") =!= col("o_totalprice"))
      .count() == 0)
    // the median is always one of the customer's own order values
    val vals = orders.select(col("o_custkey"),
      col("o_totalprice").as("v"))
    assert(m.join(vals, Seq("o_custkey"))
      .groupBy("o_custkey", "o_orderkey", "rolling_median")
      .agg(max(when(col("rolling_median") === col("v"), 1)
        .otherwise(0)).as("hit"))
      .where(col("hit") === 0).count() == 0)
    m.unpersist()
  }

  test("mm_audio_features: window geometry and energy bounds hold") {
    val f = operators.Horizon.mmAudioFeatures(spark, sf).cache()
    val docs = Tables(spark, sf, "documents")
    assert(f.count() == docs.count())
    assert(f.where(col("n_windows") =!=
      expr("(n_bytes + 255) div 256")).count() == 0)
    assert(f.where(col("peak_idx") < 0 ||
      col("peak_idx") >= col("n_windows")).count() == 0)
    // window energy ceiling: 256 bytes × 255²
    assert(f.where(col("peak_energy") > 256L * 255L * 255L).count() == 0)
    // mean of windows never exceeds the peak (r4 slack)
    assert(f.where(col("mean_energy") >
      col("peak_energy") + 1e-4).count() == 0)
    f.unpersist()
  }

  test("join_asof_nearest: every pairing is the true nearest purchase " +
      "within tolerance (brute-force cross-check)") {
    val n = operators.Horizon.joinAsofNearest(spark, sf).cache()
    assert(n.count() > 0)
    assert(n.where(col("delta_us") < 0 ||
      col("delta_us") > 3600000000L).count() == 0)
    // brute force: all (view, purchase) same-user pairs, min |delta|
    // with the backward/earlier-purchase tie rule
    val ev = Tables.eventsUs(spark, sf)
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id").as("view_event_id"),
        col("user_id"), col("ts_us").as("vt"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("pt"),
        col("event_id").as("pid"))
    val best = views.join(purch, "user_id")
      .withColumn("d", abs(col("vt") - col("pt")))
      .where(col("d") <= 3600000000L)
      // tie rule: smaller |delta| wins; equal |delta| -> backward
      // (pt <= vt) wins; still equal -> smaller event id
      .withColumn("backward", when(col("pt") <= col("vt"), 0).otherwise(1))
      .groupBy("view_event_id")
      .agg(min(struct(col("d"), col("backward"), col("pid"))).as("mn"))
      .select(col("view_event_id"), col("mn.pid").as("exp_pid"),
        col("mn.d").as("exp_d"))
    val j = n.join(best, "view_event_id")
    assert(n.count() == best.count())
    assert(j.where(col("purchase_event_id") =!= col("exp_pid") ||
      col("delta_us") =!= col("exp_d")).count() == 0)
    n.unpersist()
  }

  test("dedup_prefix: groups really share the 16-token prefix") {
    val g = operators.Horizon.dedupPrefix(spark, sf).cache()
    assert(g.count() > 0)
    assert(g.where(col("n_docs") < 2).count() == 0)
    // recompute: per fingerprint, exactly ONE distinct prefix string
    val pre = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 16)
      .select(col("doc_id"),
        expr("concat_ws(' ', slice(t, 1, 16))").as("prefix"))
      .withColumn("prefix_fp", md5(col("prefix")))
    val distinctPer = pre.groupBy("prefix_fp")
      .agg(countDistinct("prefix").as("np"), count(lit(1)).as("n"))
    assert(g.join(distinctPer, "prefix_fp")
      .where(col("np") =!= 1 || col("n") =!= col("n_docs")).count() == 0)
    g.unpersist()
  }

  test("corpus_vocab_growth: cumulative types reach the corpus " +
      "vocabulary exactly; curves are monotone") {
    val c = operators.Horizon.corpusVocabGrowth(spark, sf).cache()
    val vocab = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    val last = c.orderBy(desc("source")).limit(1).head()
    assert(last.getAs[Long]("cum_types") == vocab)
    assert(c.agg(sum("new_types")).head().getLong(0) == vocab)
    // monotone cumulatives, new_types bounded by volume
    val w = org.apache.spark.sql.expressions.Window.orderBy("source")
    val bad = c.withColumn("pt", lag("cum_types", 1).over(w))
      .withColumn("pk", lag("cum_tokens", 1).over(w))
      .where(col("pt").isNotNull &&
        (col("cum_types") < col("pt") || col("cum_tokens") < col("pk")))
    assert(bad.count() == 0)
    assert(c.where(col("new_types") > col("n_tokens")).count() == 0)
    c.unpersist()
  }

  test("events_active_users: DAU <= WAU <= MAU; windows anchor on the " +
      "first day; stickiness bounded") {
    val a = operators.Horizon.eventsActiveUsers(spark, sf).cache()
    assert(a.count() > 0)
    assert(a.where(col("dau") > col("wau") ||
      col("wau") > col("mau")).count() == 0)
    assert(a.where(col("stickiness") < 0 ||
      col("stickiness") > 1.0 + 1e-9).count() == 0)
    // day 1 has no history: all three windows see the same population
    val first = a.orderBy("day").limit(1).head()
    assert(first.getAs[Long]("dau") == first.getAs[Long]("wau") &&
      first.getAs[Long]("wau") == first.getAs[Long]("mau"))
    a.unpersist()
  }

  test("graph_modularity: bounded score, intra edges bounded by m, " +
      "communities match the LPA partition") {
    val q = operators.Horizon.graphModularity(spark, sf).head()
    val mod = q.getAs[Double]("modularity")
    assert(mod >= -0.5 - 1e-9 && mod <= 1.0 + 1e-9, s"Q out of range: $mod")
    assert(q.getAs[Long]("sum_e_in") <= q.getAs[Long]("m"))
    val nLpa = operators.Frontier.graphLpa(spark, sf)
      .select("community").distinct().count()
    assert(q.getAs[Long]("n_communities") == nLpa)
  }

  test("quality_ensemble: a repeated-token doc never out-ranks an " +
      "all-distinct doc of the same length on the diversity signal") {
    val q = Horizon.qualityEnsemble(spark, sf)
    val sig = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"),
        (size(array_distinct(col("toks"))) === size(col("toks")))
          .as("all_distinct"))
    val j = q.join(sig, "doc_id")
    val worstDistinct = j.where(col("all_distinct"))
      .agg(max("r_div")).head().getLong(0)
    val bestRepeated = j.where(!col("all_distinct"))
      .agg(min("r_div")).head().getLong(0)
    // every all-distinct doc (div_ratio = 1.0) ranks above every
    // repeated-token doc (div_ratio < 1.0)
    assert(worstDistinct < bestRepeated,
      s"diversity ranking violated: $worstDistinct !< $bestRepeated")
  }
}
