package graft

import org.apache.spark.sql.functions._
import graft.operators.Keystone

/** Round-16 operator invariants (#300-306): every statistic is pinned
  * against a direct Scala recomputation from the raw rows — never
  * against its own plan.
  */
class KeystoneSpec extends GraftSpec {

  private def cents(v: Double): Long = math.floor(v * 100.0 + 0.5).toLong

  private lazy val events: Array[(String, Long, Long)] =
    Tables.eventsUs(spark, sf)
      .select(col("event_type"), col("value"), col("ts_us"))
      .collect()
      .map(r => (r.getString(0), cents(r.getDouble(1)), r.getLong(2)))

  test("stats_ks_test: D_num, argmax and the verdict match a direct " +
      "two-CDF sweep") {
    val a = events.filter(_._1 == "click").map(_._2).sorted
    val b = events.filter(_._1 == "purchase").map(_._2).sorted
    val n1 = a.length.toLong
    val n2 = b.length.toLong
    val axis = (a ++ b).distinct.sorted
    var best = -1L
    var bestC = Long.MaxValue
    axis.foreach { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      val d = math.abs(ca * n2 - cb * n1)
      if (d > best || (d == best && v < bestC)) { best = d; bestC = v }
    }
    val r = Keystone.statsKsTest(spark, sf).head()
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("d_num") == best, "D numerator mismatch")
    assert(r.getAs[Long]("argmax_cents") == bestC)
    val reject = BigInt(best) * best * 1000000 >
      BigInt(1844164) * (n1 + n2) * n1 * n2
    assert(r.getAs[Boolean]("reject_05") == reject)
  }

  test("stats_mannwhitney: U and z match a direct merged-rank " +
      "recomputation with tie-averaged 2x ranks") {
    val a = events.filter(_._1 == "view").map(_._2)
    val b = events.filter(_._1 == "signup").map(_._2)
    val n1 = a.length.toLong
    val n2 = b.length.toLong
    val all = a ++ b
    val minRank = all.sorted.zipWithIndex.reverse.toMap.map {
      case (v, i) => v -> (i + 1).toLong
    }
    val ties = all.groupBy(identity).map { case (v, g) =>
      v -> g.length.toLong
    }
    def r2(v: Long): Long = 2 * minRank(v) + ties(v) - 1
    val r12x = a.map(v => BigInt(r2(v))).sum
    val u12x = r12x - BigInt(n1) * (n1 + 1)
    val zc = u12x - BigInt(n1) * n2
    val zcc = zc - zc.signum
    val n = n1 + n2
    val tie3 = ties.values.map(t => BigInt(t) * t * t - t).sum
    val vn = BigInt(n1) * n2 * (BigInt(n) * (BigInt(n) * n - 1) - tie3)
    val dn = BigInt(n) * (n - 1) * 12
    val z = (zcc.toDouble / 2.0) / math.sqrt(vn.toDouble / dn.toDouble)
    val out = Keystone.statsMannWhitney(spark, sf).head()
    assert(out.getAs[Long]("n1") == n1 && out.getAs[Long]("n2") == n2)
    assert(out.getAs[Long]("r1_2x") == r12x.toLong)
    assert(out.getAs[Long]("u1_2x") == u12x.toLong)
    assert(out.getAs[Double]("z") ==
      math.floor(z * 10000.0 + 0.5) / 10000.0)
    assert(out.getAs[Boolean]("reject_05") ==
      (zcc.toDouble * zcc.toDouble * 10000.0 * dn.toDouble >
        153664.0 * vn.toDouble))
  }

  test("stats_welch_t: t and df match exact-moment recomputation for " +
      "all 10 pairs") {
    val byType = events.groupBy(_._1).map { case (t, g) =>
      t -> g.map(_._2)
    }
    val out = Keystone.statsWelchT(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val ga = byType(r.getAs[String]("type_a"))
      val gb = byType(r.getAs[String]("type_b"))
      def mom(g: Array[Long]): (Long, BigInt, BigInt) =
        (g.length.toLong, g.map(BigInt(_)).sum,
          g.map(v => BigInt(v) * v).sum)
      val (n1, s1, q1) = mom(ga)
      val (n2, s2, q2) = mom(gb)
      val md = s1.toDouble / n1.toDouble - s2.toDouble / n2.toDouble
      def se2(n: Long, s: BigInt, q: BigInt): Double =
        (BigInt(n) * q - s * s).toDouble /
          (BigInt(n) * n * (n - 1)).toDouble
      val sa = se2(n1, s1, q1)
      val sb = se2(n2, s2, q2)
      val t = md / math.sqrt(sa + sb)
      val df = (sa + sb) * (sa + sb) /
        (sa * sa / (n1 - 1).toDouble + sb * sb / (n2 - 1).toDouble)
      def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
      assert(r.getAs[Double]("mean_diff") == p4(md / 100.0))
      assert(r.getAs[Double]("t_stat") == p4(t))
      assert(r.getAs[Double]("df") == p4(df))
      // Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
      assert(df >= math.min(n1, n2) - 1 - 1e-6 && df <= n1 + n2 - 2)
    }
  }

  test("stats_cramers_v: chi2 matches a direct contingency recount; " +
      "V in [0,1]") {
    val cells = events.groupBy { case (t, _, ts) =>
      (t, (ts / 86400000000L + 4) % 7)
    }.map { case (k, g) => k -> g.length.toLong }
    val rowT = cells.groupBy(_._1._1).map { case (t, g) =>
      t -> g.values.sum
    }
    val colT = cells.groupBy(_._1._2).map { case (d, g) =>
      d -> g.values.sum
    }
    val n = cells.values.sum
    // mirror sumDec: per-cell IEEE term quantized to DECIMAL(38,8)
    val chi2 = cells.map { case ((t, d), o) =>
      val num = (BigInt(o) * n - BigInt(rowT(t)) * colT(d)).toDouble
      val term = num * num / (BigInt(rowT(t)) * colT(d) * n).toDouble
      BigDecimal(term).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val r = Keystone.statsCramersV(spark, sf).head()
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Double]("chi2") == p4(chi2))
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(r.getAs[Boolean]("reject_05") == (chi2 > 36.415))
  }

  test("stats_benford: digit counts partition the positive-cents rows " +
      "and shares/ratios are exact") {
    val pos = events.map(_._2).filter(_ > 0)
    val byDigit = pos.groupBy(c => c.toString.head.asDigit.toLong)
      .map { case (d, g) => d -> g.length.toLong }
    val out = Keystone.statsBenford(spark, sf).collect()
    assert(out.map(_.getAs[Long]("digit")).toSet == byDigit.keySet)
    assert(out.map(_.getAs[Long]("n_obs")).sum == pos.length.toLong)
    val chi2s = out.map(_.getAs[Double]("chi2")).distinct
    assert(chi2s.length == 1 && chi2s.head >= 0.0)
    out.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(d >= 1 && d <= 9)
      assert(r.getAs[Long]("n_obs") == byDigit(d))
      val p = math.log10(1.0 + 1.0 / d)
      def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
      assert(r.getAs[Double]("benford_share") == p4(p))
      assert(r.getAs[Double]("obs_share") ==
        p4(byDigit(d).toDouble / pos.length))
    }
  }

  test("ts_max_drawdown: peak/trough/dd match a direct running-max " +
      "sweep per type") {
    val daily = events.groupBy { case (t, _, ts) =>
      (t, ts / 86400000000L)
    }.map { case ((t, d), g) => (t, d, g.map(_._2).sum) }
      .groupBy(_._1)
    val out = Keystone.tsMaxDrawdown(spark, sf).collect()
    assert(out.map(_.getAs[String]("event_type")).toSet == daily.keySet)
    out.foreach { r =>
      val series = daily(r.getAs[String]("event_type"))
        .toSeq.sortBy(_._2)
      var peak = Long.MinValue
      var bestDd = -1L
      var troughD = 0L
      var troughY = 0L
      var peakAtTrough = 0L
      series.foreach { case (_, d, y) =>
        if (y > peak) peak = y
        val dd = peak - y
        if (dd > bestDd) {
          bestDd = dd; troughD = d; troughY = y; peakAtTrough = peak
        }
      }
      val peakD = series.collectFirst {
        case (_, d, y) if d <= troughD && y == peakAtTrough => d
      }.get
      assert(r.getAs[Long]("max_dd_cents") == bestDd)
      assert(r.getAs[Long]("trough_day") == troughD)
      assert(r.getAs[Long]("trough_cents") == troughY)
      assert(r.getAs[Long]("peak_cents") == peakAtTrough)
      assert(r.getAs[Long]("peak_day") == peakD)
    }
  }

  test("mm_image_edges: sampled docs match a closed-form Sobel " +
      "recomputation; orientation counts bound the interior") {
    val out = Keystone.mmImageEdges(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = (16L * (1L + (id * 7 + 3) % 8)).toInt
      val h = (16L * (1L + (id * 5 + 1) % 8)).toInt
      assert(r.getAs[Long]("n_interior") == (w - 2).toLong * (h - 2))
      assert(r.getAs[Long]("n_horiz") + r.getAs[Long]("n_vert") <=
        r.getAs[Long]("n_interior"))
      assert(r.getAs[Long]("n_edge") <= r.getAs[Long]("n_interior"))
      if (id % 50 == 0) {
        def v(x: Int, y: Int): Int = ((3L * x + 5L * y + id) % 256L).toInt
        var gs = 0L; var ne = 0L; var nh = 0L; var nv = 0L
        for (y <- 1 until h - 1; x <- 1 until w - 1) {
          val gx = (v(x + 1, y - 1) + 2 * v(x + 1, y) + v(x + 1, y + 1)) -
            (v(x - 1, y - 1) + 2 * v(x - 1, y) + v(x - 1, y + 1))
          val gy = (v(x - 1, y + 1) + 2 * v(x, y + 1) + v(x + 1, y + 1)) -
            (v(x - 1, y - 1) + 2 * v(x, y - 1) + v(x + 1, y - 1))
          val m = math.abs(gx) + math.abs(gy)
          gs += m
          if (m >= 512) ne += 1
          if (math.abs(gx) > math.abs(gy)) nh += 1
          else if (math.abs(gy) > math.abs(gx)) nv += 1
        }
        assert(r.getAs[Long]("grad_l1_sum") == gs, s"doc $id grad")
        assert(r.getAs[Long]("n_edge") == ne, s"doc $id edges")
        assert(r.getAs[Long]("n_horiz") == nh && r.getAs[Long]("n_vert") == nv)
      }
    }
  }

  test("agg_moments_skew: per-type and merged-ALL shape statistics " +
      "match an exact-power-sum recomputation, and the ALL row is the " +
      "fold of the per-type partials") {
    def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val byType: Map[String, Array[Long]] =
      events.groupBy(_._1).map { case (t, g) => t -> g.map(_._2) }
    def sums(g: Array[Long]): (Long, BigInt, BigInt, BigInt, BigInt) =
      (g.length.toLong,
        g.map(BigInt(_)).sum,
        g.map(c => BigInt(c) * c).sum,
        g.map(c => BigInt(c) * c * c).sum,
        g.map(c => BigInt(c) * c * c * c).sum)
    val per = byType.map { case (t, g) => t -> sums(g) }
    val allS = {
      val vs = per.values.toSeq
      (vs.map(_._1).sum, vs.map(_._2).sum, vs.map(_._3).sum,
        vs.map(_._4).sum, vs.map(_._5).sum)
    }
    def expect(t: (Long, BigInt, BigInt, BigInt, BigInt)) = {
      val (n, s1, s2, s3, s4) = t
      val nd = n.toDouble
      val mu = s1.toDouble / nd
      val r2 = s2.toDouble / nd
      val r3 = s3.toDouble / nd
      val r4m = s4.toDouble / nd
      val m2 = r2 - mu * mu
      val m3 = r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu
      val m4 = r4m - 4.0 * mu * r3 + 6.0 * mu * mu * r2 -
        3.0 * mu * mu * mu * mu
      val ok = n >= 2 && m2 > 0
      (n, p4(mu / 100.0),
        if (ok) Some(p4(math.sqrt(m2) / 100.0)) else None,
        if (ok) Some(p4(m3 / (m2 * math.sqrt(m2)))) else None,
        if (ok) Some(p4(m4 / (m2 * m2) - 3.0)) else None)
    }
    val want = (per.map { case (t, v) => t -> expect(v) } +
      ("ALL" -> expect(allS)))
    val out = Keystone.aggMomentsSkew(spark, sf).collect()
    assert(out.length == per.size + 1)
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (n, mean, sd, sk, ku) = want(t)
      assert(r.getAs[Long]("n") == n, s"n for $t")
      assert(r.getAs[Double]("mean_dollars") == mean, s"mean for $t")
      assert(Option(r.getAs[java.lang.Double]("stddev_dollars"))
        .map(_.doubleValue) == sd, s"stddev for $t")
      assert(Option(r.getAs[java.lang.Double]("skewness"))
        .map(_.doubleValue) == sk, s"skew for $t")
      assert(Option(r.getAs[java.lang.Double]("kurtosis_excess"))
        .map(_.doubleValue) == ku, s"kurtosis for $t")
    }
    // a value stream bounded at zero with a long right tail must read
    // right-skewed somewhere - the shape stats are not vacuously flat
    assert(out.flatMap(r =>
      Option(r.getAs[java.lang.Double]("skewness"))).exists(_ > 0.5))
  }

  test("agg_winsorized_mean: exact order-statistic bounds, clip counts " +
      "and both means match a direct recomputation; winsorizing pulls " +
      "the tailed types toward the median side") {
    def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val byType = events.groupBy(_._1).map { case (t, g) => t -> g.map(_._2) }
    val out = Keystone.aggWinsorizedMean(spark, sf).collect()
    assert(out.length == byType.size)
    var anyClipped = false
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val cs = byType(t).sorted
      val n = cs.length
      val lo = cs((n + 19) / 20 - 1)
      val hi = cs((19 * n + 19) / 20 - 1)
      assert(r.getAs[Long]("n") == n.toLong)
      assert(r.getAs[Long]("p05_cents") == lo, s"p05 for $t")
      assert(r.getAs[Long]("p95_cents") == hi, s"p95 for $t")
      assert(r.getAs[Long]("n_clipped") ==
        cs.count(c => c < lo || c > hi).toLong)
      val s1 = cs.map(BigInt(_)).sum
      val sw = cs.map(c => BigInt(math.min(math.max(c, lo), hi))).sum
      assert(r.getAs[Double]("mean_dollars") ==
        p4(s1.toDouble / n / 100.0))
      assert(r.getAs[Double]("winsorized_mean_dollars") ==
        p4(sw.toDouble / n / 100.0))
      if (r.getAs[Long]("n_clipped") > 0) anyClipped = true
      // right-skewed value stream: clipping the top tail can only pull
      // the mean DOWN or hold it (never up past the raw mean + eps)
      assert(r.getAs[Double]("winsorized_mean_dollars") <=
        r.getAs[Double]("mean_dollars") + 1e-9)
    }
    assert(anyClipped, "no type clipped anything - vacuous winsorization")
  }
}
