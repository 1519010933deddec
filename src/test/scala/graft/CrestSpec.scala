package graft

import org.apache.spark.sql.functions._
import graft.operators.Crest

/** Round-15 operator invariants (#293-299): each new read is pinned
  * against an independent Scala recomputation or a conservation law —
  * never against its own plan.
  */
class CrestSpec extends GraftSpec {

  test("agg_hll_distinct: estimate lands within the sketch's error " +
      "envelope and the exact column bounds hold") {
    val rows = Crest.aggHllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      assert(r.getAs[Long]("n_shingles") >= exact && exact >= 1)
      // n/m ~ 2.6 at sf0.001 — inside the known raw-HLL bias hump
      // (HLL++'s empirical-correction zone), so the envelope here is
      // looser than the 4.6% asymptotic stderr
      assert(r.getAs[Double]("rel_err") < 0.25,
        s"${r.getAs[String]("source")}: rel_err ${r.getAs[Double]("rel_err")}")
    }
  }

  test("cdc_time_travel: live + deleted conserves the base per status, " +
      "and version counts partition the live set") {
    val base = Tables(spark, sf, "orders")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Crest.cdcTimeTravel(spark, sf).collect()
    assert(out.map(_.getAs[String]("o_orderstatus")).toSet == base.keySet)
    out.foreach { r =>
      val st = r.getAs[String]("o_orderstatus")
      assert(r.getAs[Long]("n_live") + r.getAs[Long]("n_deleted_asof")
        == base(st), s"$st: live+deleted != base")
      assert(r.getAs[Long]("n_upd_v1") + r.getAs[Long]("n_upd_v2")
        <= r.getAs[Long]("n_live"))
      assert(r.getAs[Long]("n_pending") >= 0L)
    }
    // the interleaved histories are exercised: some deletions applied,
    // some updates survive at both versions, some changes pend
    assert(out.map(_.getAs[Long]("n_deleted_asof")).sum > 0)
    assert(out.map(_.getAs[Long]("n_upd_v1")).sum > 0)
    assert(out.map(_.getAs[Long]("n_pending")).sum > 0)
  }

  test("ts_mann_kendall: S, the tie-corrected variance numerator, and " +
      "the trend label match a direct O(n^2) recomputation") {
    val daily = Tables.eventsUs(spark, sf)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("d"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val out = Crest.tsMannKendall(spark, sf).collect()
    assert(out.map(_.getAs[String]("event_type")).toSet == daily.keySet)
    out.foreach { r =>
      val series = daily(r.getAs[String]("event_type"))
        .sortBy(_._2).map(_._3)
      val n = series.length.toLong
      var s = 0L
      for (i <- series.indices; j <- (i + 1) until series.length)
        s += java.lang.Long.signum(series(j) - series(i))
      val tieTerm = series.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (t * 2 + 5) })
        .sum
      val varNum = n * (n - 1) * (n * 2 + 5) - tieTerm
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("s_stat") == s, "S mismatch")
      assert(r.getAs[Long]("var_num") == varNum, "var_num mismatch")
      assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
      // label consistency in integer space (never via the float z)
      val sc = s - java.lang.Long.signum(s)
      val sig = s != 0 && sc * sc * 180000L > 38416L * varNum
      val expected =
        if (sig && s > 0) "increasing"
        else if (sig && s < 0) "decreasing"
        else "no_trend"
      assert(r.getAs[String]("trend") == expected)
    }
  }

  test("agg_spearman: rho equals an exact Scala recomputation with " +
      "tie-averaged ranks (2x-integer space)") {
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    def ranks2x(xs: Seq[Double]): Seq[Long] = {
      // 2*avg_rank = 2*min_rank + tie_count - 1, exactly as both engines
      val sorted = xs.sorted
      val minRank = sorted.zipWithIndex.reverse.toMap.map {
        case (v, i) => v -> (i + 1).toLong
      }
      val ties = xs.groupBy(identity).map { case (v, g) =>
        v -> g.length.toLong
      }
      xs.map(v => 2 * minRank(v) + ties(v) - 1)
    }
    val out = Crest.aggSpearman(spark, sf).collect()
    assert(out.map(_.getAs[String]("l_returnflag")).toSet == li.keySet)
    out.foreach { r =>
      val g = li(r.getAs[String]("l_returnflag"))
      val rx = ranks2x(g.map(_._2))
      val ry = ranks2x(g.map(_._3))
      val n = BigInt(g.length)
      val sx = rx.map(BigInt(_)).sum
      val sy = ry.map(BigInt(_)).sum
      val sxx = rx.map(v => BigInt(v) * v).sum
      val syy = ry.map(v => BigInt(v) * v).sum
      val sxy = rx.zip(ry).map { case (a, b) => BigInt(a) * b }.sum
      val rho = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
      val expected = math.floor(rho * 10000.0 + 0.5) / 10000.0
      assert(r.getAs[Long]("n_rows") == g.length.toLong)
      assert(r.getAs[Double]("spearman_rho") == expected,
        s"${r.getAs[String]("l_returnflag")}: " +
          s"${r.getAs[Double]("spearman_rho")} != $expected")
      assert(math.abs(expected) <= 1.0)
    }
  }

  test("graph_rich_club: N_k/E_k match a direct recomputation from the " +
      "edge list; both are nonincreasing; phi in [0,1]") {
    val edges = Crest.undirectedEdges(spark, sf)
      .collect().map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb")))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val out = Crest.graphRichClub(spark, sf).collect()
    assert(out.length == 12)
    var prevN = Long.MaxValue
    var prevE = Long.MaxValue
    out.sortBy(_.getAs[Long]("k")).foreach { r =>
      val k = r.getAs[Long]("k")
      val nk = deg.values.count(_ > k).toLong
      val ek = edges.count { case (a, b) =>
        math.min(deg(a), deg(b)) > k
      }.toLong
      assert(r.getAs[Long]("n_nodes") == nk, s"k=$k N_k")
      assert(r.getAs[Long]("n_edges") == ek, s"k=$k E_k")
      assert(nk <= prevN && ek <= prevE, s"k=$k not nonincreasing")
      prevN = nk; prevE = ek
      if (nk >= 2) {
        val phi = r.getAs[Double]("phi")
        assert(phi >= 0.0 && phi <= 1.0, s"k=$k phi=$phi")
      }
    }
  }

  test("mm_image_hist: bins sum to the pixel count, dims match the " +
      "planted closed form, and sampled histograms are pixel-exact") {
    val out = Crest.mmImageHist(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = 16L * (1L + (id * 7 + 3) % 8)
      val h = 16L * (1L + (id * 5 + 1) % 8)
      assert(r.getAs[Long]("n_px") == w * h)
      val bins = (0 to 7).map(b => r.getAs[Long](s"b$b"))
      assert(bins.sum == w * h, s"doc $id: bins don't sum to n_px")
      if (id % 50 == 0) { // sampled full closed-form recomputation
        val exp = new Array[Long](8)
        for (y <- 0L until h; x <- 0L until w)
          exp((((3 * x + 5 * y + id) % 256) / 32).toInt) += 1
        assert(bins == exp.toSeq, s"doc $id: histogram != closed form")
        val dom = exp.zipWithIndex.maxBy { case (c, b) => (c, -b) }._2
        assert(r.getAs[Long]("dominant_bin") == dom.toLong)
      }
    }
  }

  test("cdc_vacuum_plan: segments partition the log, vacuumable implies " +
      "folded, and the flags match the segment's max effective date") {
    val keys = Tables(spark, sf, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val expectedLog =
      keys.count(_ % 7 == 0) + keys.count(_ % 21 == 0) +
        keys.count(_ % 11 == 0)
    val out = Crest.cdcVacuumPlan(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_changes")).sum == expectedLog.toLong)
    out.foreach { r =>
      val month = r.getAs[String]("seg_month")
      val minEff = r.getAs[String]("min_eff")
      val maxEff = r.getAs[String]("max_eff")
      assert(minEff.startsWith(month) && maxEff.startsWith(month))
      assert(minEff <= maxEff)
      assert(r.getAs[Long]("n_updates") + r.getAs[Long]("n_tombstones")
        == r.getAs[Long]("n_changes"))
      val folded = r.getAs[Boolean]("folded")
      val vac = r.getAs[Boolean]("vacuumable")
      assert(!vac || folded, s"$month vacuumable but not folded")
      assert(folded == (maxEff <= "1996-06-30"))
      assert(vac == (maxEff <= "1996-04-01"))
    }
    // the watermark splits the timeline: some segments folded, some not
    assert(out.exists(_.getAs[Boolean]("vacuumable")))
    assert(out.exists(!_.getAs[Boolean]("folded")))
  }

  test("events_seq_support: top-25 matches a brute-force subsequence " +
      "scan over per-user sorted streams") {
    val events = Tables.eventsUs(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    val types = events.map(_._2).distinct.sorted
    // genuine witness scan, NOT the min/max-WLOG shortcut the plan
    // uses: existentially quantify ALL THREE occurrences
    val support = scala.collection.mutable.Map[(String, String, String), Long]()
      .withDefaultValue(0L)
    byUser.foreach { case (_, evs) =>
      val times = evs.groupBy(_._2).map { case (t, g) =>
        t -> g.map(_._3).sorted
      }
      for (t1 <- types; t2 <- types; t3 <- types
           if times.contains(t1) && times.contains(t2) &&
             times.contains(t3)) {
        val found = times(t1).exists(x => times(t2).exists(y =>
          x < y && times(t3).exists(z => z > y)))
        if (found) support((t1, t2, t3)) += 1
      }
    }
    val expected = support.toSeq
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }
      .take(25)
    val out = Crest.eventsSeqSupport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n_users"))).toSeq
    assert(out == expected)
  }
}
