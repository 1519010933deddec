package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Summit}

/** Invariant specs for the round-13 additions (#262+). Value-level
  * correctness is the DuckDB oracle's job (tools/check.py); these pin
  * the algebraic/structural contracts that must be PROVED rather than
  * eyeballed: the skew audit's internal identities, exact-rank
  * monotonicity, the life-table risk-set recursion, κ's exact-rational
  * class boundaries, greedy-beam admissibility vs brute force, the
  * frame-count identity, the breakout band inequality, and row-share
  * normalization.
  */
class SummitSpec extends GraftSpec {

  test("audit_key_skew: internal identities — top-1 row carries " +
      "max_rows, p99 ≤ max, mean·n_keys = n_rows, salt levels the max") {
    val out = Summit.auditKeySkew(spark, sf).cache()
    val rows = out.collect()
    assert(rows.length == 5)
    val top = rows.head
    assert(top.getAs[Long]("key_rows") == top.getAs[Long]("max_rows"))
    val nRows = top.getAs[Long]("n_rows")
    val nKeys = top.getAs[Long]("n_keys")
    assert(nRows == Tables(spark, sf, "lineitem").count())
    assert(nKeys ==
      Tables(spark, sf, "lineitem").select("l_partkey").distinct().count())
    assert(top.getAs[Long]("p99_rows") <= top.getAs[Long]("max_rows"))
    // salt = ceil(max/mean): salt·n_rows ≥ max·n_keys > (salt−1)·n_rows
    val salt = top.getAs[Long]("salt")
    val maxR = top.getAs[Long]("max_rows")
    assert(salt * nRows >= maxR * nKeys &&
      (salt - 1) * nRows < maxR * nKeys)
    // salt_bits = ⌈log₂ salt⌉
    val bits = top.getAs[Long]("salt_bits")
    assert(bits == (if (salt <= 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(salt - 1)))
    // descending heavy keys
    val kr = rows.map(_.getAs[Long]("key_rows"))
    assert(kr.zip(kr.tail).forall { case (a, b) => a >= b })
    out.unpersist()
  }

  test("events_funnel_latency: median ≤ p90, step-2 converters are a " +
      "subset of step-1's, latencies positive") {
    val out = Summit.eventsFunnelLatency(spark, sf).cache()
    val rows = out.collect().map(r =>
      r.getAs[String]("step") -> r).toMap
    assert(rows.size == 2)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_conv") > 0)
      assert(r.getAs[Long]("median_s") >= 0)
      assert(r.getAs[Long]("median_s") <= r.getAs[Long]("p90_s"))
      assert(r.getAs[Double]("mean_s") > 0.0)
    }
    assert(rows("2_click_to_purchase").getAs[Long]("n_conv") <=
      rows("1_view_to_click").getAs[Long]("n_conv"))
    out.unpersist()
  }

  test("orders_hazard_curve: life-table recursion — risk set at m is " +
      "risk at m+1 plus events at m; hazards in (0,1]; gap total checks") {
    val out = Summit.ordersHazardCurve(spark, sf).cache()
    val rows = out.orderBy("month_offset").collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_at_risk") ==
          b.getAs[Long]("n_at_risk") + a.getAs[Long]("n_events"))
      case _ =>
    }
    val last = rows.last
    assert(last.getAs[Long]("n_at_risk") == last.getAs[Long]("n_events"))
    // total gaps = orders − customers-with-orders (k orders → k−1 gaps)
    val totalGaps = rows.map(_.getAs[Long]("n_events")).sum
    val o = Tables(spark, sf, "orders")
    assert(totalGaps ==
      o.count() - o.select("o_custkey").distinct().count())
    rows.foreach { r =>
      val h = r.getAs[Double]("hazard")
      assert(h > 0.0 && h <= 1.0)
    }
    out.unpersist()
  }

  test("quality_rule_kappa: κ matches an exact-rational recomputation " +
      "and the agreement class sits on the integer thresholds") {
    val out = Summit.qualityRuleKappa(spark, sf).cache()
    val n = Tables(spark, sf, "documents").count()
    val rows = out.collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val a = BigInt(r.getAs[Long]("n_both"))
      val b = BigInt(r.getAs[Long]("n_a")) - a
      val c = BigInt(r.getAs[Long]("n_b")) - a
      val d = BigInt(n) - a - b - c
      val num = 2 * (a * d - b * c)
      val den = (a + b) * (b + d) + (a + c) * (c + d)
      if (den == 0) {
        assert(r.isNullAt(r.fieldIndex("kappa")))
        assert(r.getAs[String]("agreement") == "degenerate")
      } else {
        val kappa = r.getAs[Double]("kappa")
        val exact = num.toDouble / den.toDouble
        assert(math.abs(kappa - exact) < 1e-4)
        val cls =
          if (num < 0) "poor"
          else if (num * 5 < den) "slight"
          else if (num * 5 < den * 2) "fair"
          else if (num * 5 < den * 3) "moderate"
          else if (num * 5 < den * 4) "substantial"
          else "almost_perfect"
        assert(r.getAs[String]("agreement") == cls)
      }
    }
    out.unpersist()
  }

  test("ann_graph_search: contiguous ranks, cosine admissible vs the " +
      "brute-force optimum, per-query descending scores") {
    val out = Summit.annGraphSearch(spark, sf).cache()
    assert(out.count() > 0)
    val perQ = out.groupBy("q_id").agg(
      count(lit(1)).as("n"), min("rank").as("rmin"),
      max("rank").as("rmax")).collect()
    perQ.foreach { r =>
      assert(r.getAs[Long]("rmin") == 1L)
      assert(r.getAs[Long]("rmax") == r.getAs[Long]("n"))
    }
    // greedy is admissible: its best cosine never beats brute force's
    val bf = Similarity.annBruteforce(spark, sf)
      .where(col("rank") === 1)
      .select(col("q_id"), col("cosine").as("bf_best"))
    val gs = out.where(col("rank") === 1)
      .select(col("q_id"), col("cosine").as("gs_best"))
    assert(gs.join(bf, "q_id")
      .where(col("gs_best") > col("bf_best") + 1e-9).count() == 0)
    // scores non-increasing with rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy("rank")
    assert(out.withColumn("prev", lag("cosine", 1).over(w))
      .where(col("prev").isNotNull && col("cosine") > col("prev") + 1e-9)
      .count() == 0)
    out.unpersist()
  }

  test("mm_shot_boundaries: planted frame-count identity 4+(3·id+1)%5 " +
      "(pixels-true videos since round 19), shot count bounded by " +
      "frames, mean is the r4'd frames-per-shot ratio") {
    val out = Summit.mmShotBoundaries(spark, sf).cache()
    val docs = Tables(spark, sf, "documents").select(col("doc_id"))
    assert(out.count() == docs.count())
    // ImageCodecSpec pins per-doc cut detection against the planted
    // truth; here the structural invariants over the whole corpus
    assert(out.where(col("n_frames") =!=
      expr("4 + (3 * doc_id + 1) % 5")).count() == 0)
    assert(out.where(col("n_shots") < 1 ||
      col("n_shots") > col("n_frames")).count() == 0)
    assert(out.where(col("max_hamming") < 0 ||
      col("max_hamming") > 64).count() == 0)
    assert(out.where(abs(col("mean_shot_frames") -
      expr("floor(n_frames / n_shots * 10000.0 + 0.5) / 10000.0"))
      > 1e-12).count() == 0)
    out.unpersist()
  }

  test("ts_bollinger_breakout: every flagged point clears the exact " +
      "integer band (z² > 1 where defined), sides consistent") {
    val out = Summit.tsBollingerBreakout(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.where(col("z2").isNotNull && col("z2") <= 1.0 - 1e-4)
      .count() == 0)
    assert(out.where(!col("side").isin("up", "down")).count() == 0)
    out.unpersist()
  }

  test("orders_brand_switch: per-origin shares r4-sum to 1, loyalty " +
      "flag is the diagonal, transition total is the gap total") {
    val out = Summit.ordersBrandSwitch(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.where(col("is_loyal") =!=
      (col("brand_from") === col("brand_to"))).count() == 0)
    val sums = out.groupBy("brand_from")
      .agg(sum("share").as("s"), count(lit(1)).as("k")).collect()
    sums.foreach { r =>
      // each share is r4'd: row sum drifts by at most k·0.5e-4
      assert(math.abs(r.getAs[Double]("s") - 1.0) <=
        r.getAs[Long]("k") * 1e-4)
    }
    // k brand-carrying orders per customer → k−1 transitions (orders
    // with no lineitems have no modal brand and drop from the sequence)
    val withLines = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem").select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey"))
    val expected =
      withLines.count() - withLines.select("o_custkey").distinct().count()
    val total = out.agg(sum("n_trans")).head().getLong(0)
    assert(total == expected)
    out.unpersist()
  }

  test("events_anomaly_iqr: fences bracket the quartiles, quartiles " +
      "match a direct sorted-rank recomputation, outliers bounded") {
    val out = Summit.eventsAnomalyIqr(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    val cents = Tables.eventsUs(spark, sf)
      .selectExpr("event_type", "cast(floor(value * 100.0 + 0.5) as bigint) v")
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val vs = cents(t)
      val n = vs.length
      assert(r.getAs[Long]("n_events") == n)
      // exact-rank quartiles: smallest value with 4·cum ≥ n (resp. 3n)
      val q1c = vs((n + 3) / 4 - 1)
      val q3c = vs((3 * n + 3) / 4 - 1)
      assert(math.abs(r.getAs[Double]("q1") - q1c / 100.0) < 1e-4)
      assert(math.abs(r.getAs[Double]("q3") - q3c / 100.0) < 1e-4)
      assert(r.getAs[Double]("low_fence") <= r.getAs[Double]("q1") &&
        r.getAs[Double]("q1") <= r.getAs[Double]("q3") &&
        r.getAs[Double]("q3") <= r.getAs[Double]("high_fence"))
      val nOut = r.getAs[Long]("n_low") + r.getAs[Long]("n_high")
      assert(nOut >= 0 && nOut < n)
      assert(r.getAs[Long]("n_low") == vs.count(v => 2 * v < 5 * q1c - 3 * q3c))
      assert(r.getAs[Long]("n_high") == vs.count(v => 2 * v > 5 * q3c - 3 * q1c))
    }
    out.unpersist()
  }

  test("graph_embeddedness: Σ common-neighbors over edges = 3·triangle " +
      "census, cn bounds, bridge flag is the cn=0 set") {
    val out = Summit.graphEmbeddedness(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.where(col("is_local_bridge") =!= (col("cn") === 0L))
      .count() == 0)
    // b ∈ N(a) but b is never a COMMON neighbor → cn ≤ min(da,db) − 1
    assert(out.where(col("cn") >
      least(col("da"), col("db")) - 1).count() == 0)
    assert(out.where(col("jaccard") < 0.0 || col("jaccard") >= 1.0)
      .count() == 0)
    // each triangle has 3 edges, each seeing the third vertex as a
    // common neighbor: Σ cn = 3 · census
    val sumCn = out.agg(sum("cn")).head().getLong(0)
    val tri = operators.Graph.graphTriangles(spark, sf)
      .agg(sum("n_triangles")).head().getLong(0)
    assert(sumCn == 3 * tri)
    out.unpersist()
  }

  test("mm_audio_vad: planted frame identity (512+(13·id+7)%512) div " +
      "100 (samples-true since round 19), run accounting consistent " +
      "(voiced = Σ runs, longest ≤ voiced, segments ≥ 1 iff any " +
      "voiced)") {
    val out = Summit.mmAudioVad(spark, sf).cache()
    val docs = Tables(spark, sf, "documents").select(col("doc_id"))
    assert(out.count() == docs.count())
    // AudioCodecSpec pins per-doc segments against decoded samples;
    // here the structural invariants over the whole corpus
    assert(out.where(col("n_frames") =!=
      expr("(512 + (13 * doc_id + 7) % 512) div 100")).count() == 0)
    assert(out.where(col("n_voiced") > col("n_frames") ||
      col("longest_run") > col("n_voiced") ||
      col("n_segments") > col("n_voiced")).count() == 0)
    assert(out.where((col("n_voiced") > 0) =!= (col("n_segments") > 0))
      .count() == 0)
    assert(out.where(col("n_segments") > 0 &&
      col("longest_run") * col("n_segments") < col("n_voiced"))
      .count() == 0)
    out.unpersist()
  }

  test("quality_cascade_plan: 24 contiguous ranks, best ≤ identity " +
      "ordering, identity ordering cost matches a direct per-doc " +
      "first-failure recomputation") {
    val out = Summit.qualityCascadePlan(spark, sf).cache()
    val rows = out.collect()
    assert(rows.length == 24)
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 24L))
    rows.foreach { r =>
      val e = r.getAs[Double]("expected_evals")
      assert(e >= 1.0 && e <= 4.0)
    }
    // direct recomputation for the identity cascade order
    val flags = operators.Pinnacle.ruleFlags(spark, sf)
    val direct = flags.select(
      when(col("f0") === 1, 1L).when(col("f1") === 1, 2L)
        .when(col("f2") === 1, 3L).when(col("f3") === 1, 4L)
        .otherwise(4L).as("evals"))
      .agg(sum("evals").cast("double") / count(lit(1))).head().getDouble(0)
    val identity = rows.find(_.getAs[String]("ordering") ==
      "min_tokens>repetition>token_shape>digit_ratio").get
    assert(math.abs(identity.getAs[Double]("expected_evals") - direct) < 1e-4)
    val best = rows.find(_.getAs[Long]("rank") == 1L).get
    assert(best.getAs[Double]("expected_evals") <=
      identity.getAs[Double]("expected_evals") + 1e-12)
    out.unpersist()
  }

  test("text_vocab_gini: the frequency-histogram device equals the " +
      "direct |vocab|-wide sorted-rank computation") {
    val out = Summit.textVocabGini(spark, sf).head()
    // direct: global row_number over (f, tok) — the #133 shape the
    // histogram device replaces at scale
    val freq = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("f"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("f", "tok")
    val ranked = freq.withColumn("i", row_number().over(w))
    val agg = ranked.agg(
      count(lit(1)).as("n"),
      sum("f").as("t"),
      sum(col("i") * col("f")).as("wsum")).head()
    val n = agg.getAs[Long]("n"); val t = agg.getAs[Long]("t")
    val wsum = agg.getAs[Long]("wsum")
    val direct = (2.0 * wsum - (n + 1).toDouble * t) / (n.toDouble * t)
    val directR4 = math.floor(direct * 10000.0 + 0.5) / 10000.0
    assert(out.getAs[Long]("n_types") == n)
    assert(out.getAs[Long]("n_tokens") == t)
    assert(out.getAs[Double]("gini") == directR4)
  }

  test("embed_text_conflict: planted aligned re-uploads never conflict " +
      "(cosine 1), pairs are exactly the planted id offset") {
    val out = Summit.embedTextConflict(spark, sf).cache()
    assert(out.count() > 0)
    // the organic corpus has no byte dups: every pair is rep → rep+10^12
    assert(out.where(col("dup_id") =!= col("rep_id") + 1000000000000L)
      .count() == 0)
    val aligned = out.where(col("rep_id") % 14 === 0)
    assert(aligned.count() > 0)
    assert(aligned.where(col("conflict") ||
      col("cosine") < 0.9999).count() == 0)
    // misaligned rows exist and at least one conflicts (random vectors)
    val misaligned = out.where(col("rep_id") % 14 =!= 0)
    assert(misaligned.count() > 0)
    assert(misaligned.where(col("conflict")).count() > 0)
    out.unpersist()
  }

  test("text_code_detect: per-doc coverage, vote recomputation from " +
      "emitted counts matches is_code") {
    val out = Summit.textCodeDetect(spark, sf).cache()
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).as("len"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "\n", "")) + 1).as("n_lines"))
    assert(out.count() == docs.count())
    val joined = out.join(docs, "doc_id")
    assert(joined.where(
      (((col("n_sym") * 20 > col("len")).cast("int") +
        (col("n_underscore") * 100 > col("len")).cast("int") +
        (col("n_indent") * 10 > col("n_lines")).cast("int")) >= 2) =!=
        col("is_code")).count() == 0)
    assert(joined.where(abs(col("sym_density") -
      expr("floor(n_sym / len * 10000.0 + 0.5) / 10000.0")) > 1e-12)
      .count() == 0)
    out.unpersist()
  }

  test("graph_walk_corpus: one walk per node, every hop is a graph " +
      "arc, hops follow the md5 rank rule") {
    val out = Summit.graphWalkCorpus(spark, sf).cache()
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val und = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(countDistinct(col("a.o")).as("sup"))
      .where(col("sup") >= 2).select("pa", "pb")
    val adj = und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst")))
      .cache()
    val nNodes = adj.select("src").distinct().count()
    assert(out.count() == nNodes)
    for ((a, b) <- Seq(("n0", "n1"), ("n1", "n2"), ("n2", "n3"))) {
      val bad = out.select(col(a).as("src"), col(b).as("dst"))
        .except(adj)
      assert(bad.count() == 0, s"hop $a->$b left the graph")
    }
    adj.unpersist(); out.unpersist()
  }

  test("ann_binary_hamming: packed-XOR hamming equals the unpacked " +
      "sign-disagreement sum, ranks contiguous and distance-monotone") {
    val out = Summit.annBinaryHamming(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.where(col("hamming") < 0 || col("hamming") > 64)
      .count() == 0)
    val emb = Tables(spark, sf, "embeddings")
    val unpacked = out
      .join(emb.select(col("vec_id").as("q_id"),
        col("embedding").as("qe")), "q_id")
      .join(emb.select(col("vec_id").as("c_id"),
        col("embedding").as("ce")), "c_id")
      .withColumn("h2", expr(
        """aggregate(sequence(1, 64), 0L, (acc, i) ->
          |  acc + if((element_at(qe, i) > 0.0F) !=
          |    (element_at(ce, i) > 0.0F), 1L, 0L))""".stripMargin))
    assert(unpacked.where(col("hamming") =!= col("h2")).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy("rank")
    assert(out.withColumn("prev", lag("hamming", 1).over(w))
      .where(col("prev").isNotNull && col("hamming") < col("prev"))
      .count() == 0)
    out.unpersist()
  }

  test("embed_matryoshka_eval: overlap matches an independent " +
      "brute-force recomputation of both rankings") {
    val out = Summit.embedMatryoshkaEval(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.where(col("n_overlap") < 0 || col("n_overlap") > 5)
      .count() == 0)
    val v = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val q = operators.Similarity.evalQueries(spark, sf)
    val full5 = operators.Similarity.annBruteforceFrom(v, q, 5)
      .select("q_id", "c_id")
    val pref5 = operators.Similarity.annBruteforceFrom(
      v.select(col("vec_id"), expr("slice(embedding, 1, 16)").as("embedding")),
      q.select(col("q_id"), expr("slice(q_emb, 1, 16)").as("q_emb")), 5)
      .select("q_id", "c_id")
    val expected = full5.join(pref5, Seq("q_id", "c_id"))
      .groupBy("q_id").agg(count(lit(1)).as("exp_overlap"))
    assert(out.join(expected, Seq("q_id"), "left")
      .where(col("n_overlap") =!=
        coalesce(col("exp_overlap"), lit(0L))).count() == 0)
    out.unpersist()
  }

  test("ts_period_detect: one row per type, lag in [2,24], winning acf " +
      "dominates the ts_acf lag-2/3 values") {
    val out = Summit.tsPeriodDetect(spark, sf).cache()
    val types = Tables.eventsUs(spark, sf)
      .select("event_type").distinct().count()
    assert(out.count() == types)
    assert(out.where(col("best_lag") < 2 || col("best_lag") > 24)
      .count() == 0)
    // the winner is a max over lags ⊇ {2, 3}: it can't lose to the
    // published ts_acf values at those lags
    val acf23 = operators.Horizon.tsAcf(spark, sf)
      .where(col("lag").isin(2L, 3L) && col("acf").isNotNull)
      .groupBy("event_type").agg(max("acf").as("ref"))
    assert(out.join(acf23, "event_type")
      .where(col("acf") < col("ref") - 1e-12).count() == 0)
    out.unpersist()
  }

  test("sample_class_balanced: every class keeps exactly the min class " +
      "count, ranks contiguous") {
    val out = Summit.sampleClassBalanced(spark, sf).cache()
    val counts = Tables(spark, sf, "documents")
      .groupBy("lang").agg(count(lit(1)).as("cnt"))
    val k = counts.agg(min("cnt")).head().getLong(0)
    val kept = out.groupBy("lang").agg(
      count(lit(1)).as("n"), max("rk").as("rmax")).collect()
    assert(kept.length == counts.count())
    kept.foreach { r =>
      assert(r.getAs[Long]("n") == k && r.getAs[Long]("rmax") == k)
    }
    out.unpersist()
  }

  test("text_template_coverage: per-doc attribution sums back to the " +
      "top-100 grams' total occurrences") {
    val out = Summit.textTemplateCoverage(spark, sf).cache()
    val docs = Tables(spark, sf, "documents")
    assert(out.count() == docs.count())
    assert(out.where(col("coverage") < 0.0 || col("coverage") > 1.0)
      .count() == 0)
    val bigrams = docs.select(explode(expr(
      """zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
        |  slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
        |  (a, b) -> concat(a, ' ', b))""".stripMargin)).as("gram"))
    val topTotal = bigrams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("gram")).limit(100)
      .agg(sum("cnt")).head().getLong(0)
    assert(out.agg(sum("n_template")).head().getLong(0) == topTotal)
    out.unpersist()
  }

  test("orders_abc_migration: row shares normalize, customer total " +
      "conserved, no absent->absent cell") {
    val out = Summit.ordersAbcMigration(spark, sf).cache()
    assert(out.where(col("class_from") === "absent" &&
      col("class_to") === "absent").count() == 0)
    val total = out.agg(sum("n_cust")).head().getLong(0)
    assert(total ==
      Tables(spark, sf, "orders").select("o_custkey").distinct().count())
    out.groupBy("class_from")
      .agg(sum("share").as("s"), count(lit(1)).as("cells")).collect()
      .foreach { r =>
        assert(math.abs(r.getAs[Double]("s") - 1.0) <=
          r.getAs[Long]("cells") * 1e-4)
      }
    out.unpersist()
  }
}
