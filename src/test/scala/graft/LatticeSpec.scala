package graft

import org.apache.spark.sql.functions._
import graft.operators.Lattice

/** Round-17 operator invariants (#307-312): every statistic pinned
  * against a direct Scala recomputation from raw rows.
  */
class LatticeSpec extends GraftSpec {

  private def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  private def cents(v: Double): Long = math.floor(v * 100.0 + 0.5).toLong

  private lazy val events: Array[(Long, String, Long, Long)] =
    Tables.eventsUs(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"),
        col("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), cents(r.getDouble(2)),
        r.getLong(3)))

  private def moments(g: Array[Long]): (Long, BigInt, BigInt) =
    (g.length.toLong, g.map(BigInt(_)).sum, g.map(v => BigInt(v) * v).sum)

  test("stats_anova: F matches an exact-moment recomputation with " +
      "sumDec-quantized group terms") {
    val byType = events.groupBy(_._2).map { case (t, g) => t -> g.map(_._3) }
    val ms = byType.values.map(moments).toSeq
    val k = ms.length.toLong
    val n = ms.map(_._1).sum
    val st = ms.map(_._2).sum
    val qt = ms.map(_._3).sum
    val sb = ms.map { case (ni, si, _) =>
      BigDecimal((si * si).toDouble / ni.toDouble)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val ssb = sb - (st * st).toDouble / n.toDouble
    val ssw = qt.toDouble - sb
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val r = Lattice.statsAnova(spark, sf).head()
    assert(r.getAs[Long]("k") == k && r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("df1") == k - 1 && r.getAs[Long]("df2") == n - k)
    assert(r.getAs[Double]("f_stat") == p4(f))
    assert(r.getAs[Boolean]("reject_05_asymp") == (f > 2.3719))
    assert(ssb >= 0 && ssw > 0)
  }

  test("stats_power_mde: mde and required n match the moment formulas " +
      "for all 10 pairs") {
    val byType = events.groupBy(_._2).map { case (t, g) =>
      t -> moments(g.map(_._3))
    }
    val z = 1.959964 + 0.841621
    val out = Lattice.statsPowerMde(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val (n1, s1, q1) = byType(r.getAs[String]("type_a"))
      val (n2, s2, q2) = byType(r.getAs[String]("type_b"))
      def v(n: Long, s: BigInt, q: BigInt): Double =
        (BigInt(n) * q - s * s).toDouble / (BigInt(n) * (n - 1)).toDouble
      val va = v(n1, s1, q1)
      val vb = v(n2, s2, q2)
      val delta = s1.toDouble / n1 - s2.toDouble / n2
      assert(r.getAs[Double]("observed_diff") == p4(delta / 100.0))
      assert(r.getAs[Double]("mde_dollars") ==
        p4(z * math.sqrt(va / n1 + vb / n2) / 100.0))
      if (math.abs(delta) > 1e-9)
        assert(r.getAs[Double]("n_req_per_arm") ==
          p4(z * z * (va + vb) / (delta * delta)))
      // MDE shrinks as 1/sqrt(n): sanity that it is positive and small
      // relative to the value scale
      assert(r.getAs[Double]("mde_dollars") > 0.0)
    }
  }

  test("stats_bootstrap_ci: the 40 Poisson resamples, their means, and " +
      "the rank-2/39 bounds replicate exactly from md5") {
    val purchases = events.filter(_._2 == "purchase")
      .map(e => (e._1, e._3))
    def weight(id: Long, b: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$b".getBytes("UTF-8"))
      val hex = md.take(8).map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16) % 1000000L
      if (h < 367879L) 0L else if (h < 735759L) 1L
      else if (h < 919699L) 2L else if (h < 981012L) 3L else 4L
    }
    val means = (0 until 40).flatMap { b =>
      var sw = BigInt(0); var nw = 0L
      purchases.foreach { case (id, c) =>
        val w = weight(id, b); sw += BigInt(w) * c; nw += w
      }
      if (nw > 0) Some((b, sw.toDouble / nw.toDouble)) else None
    }
    val sorted = means.sortBy { case (b, m) => (m, b) }
    val lo = sorted(1)._2
    val hi = sorted(38)._2
    val obs = purchases.map(p => BigInt(p._2)).sum.toDouble /
      purchases.length
    val r = Lattice.statsBootstrapCi(spark, sf).head()
    assert(r.getAs[Long]("n") == purchases.length.toLong)
    assert(r.getAs[Double]("obs_mean_dollars") == p4(obs / 100.0))
    assert(r.getAs[Double]("ci_lo_dollars") == p4(lo / 100.0))
    assert(r.getAs[Double]("ci_hi_dollars") == p4(hi / 100.0))
    assert(lo <= hi)
    // the observed mean sits inside the 95% bootstrap band on this data
    assert(lo <= obs && obs <= hi)
  }

  test("events_cuped: theta and the variance reduction match exact " +
      "user-moment recomputation per type") {
    val days = events.map(_._4 / 86400000000L)
    val mid = (days.min + days.max + 1) / 2
    val byType = events.groupBy(_._2)
    val out = Lattice.eventsCuped(spark, sf).collect()
    assert(out.map(_.getAs[String]("event_type")).toSet == byType.keySet)
    out.foreach { r =>
      // the shared `events` collect lacks user_id — re-collect per type
      val rows = Tables.eventsUs(spark, sf)
        .where(col("event_type") === r.getAs[String]("event_type"))
        .select(col("user_id"), expr("ts_us div 86400000000").as("d"),
          expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("c"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      val byUser = rows.groupBy(_._1).map { case (_, es) =>
        (es.filter(_._2 < mid).map(_._3).sum,
          es.filter(_._2 >= mid).map(_._3).sum)
      }.toSeq
      val n = BigInt(byUser.length)
      val sx = byUser.map(u => BigInt(u._1)).sum
      val sy = byUser.map(u => BigInt(u._2)).sum
      val sxx = byUser.map(u => BigInt(u._1) * u._1).sum
      val syy = byUser.map(u => BigInt(u._2) * u._2).sum
      val sxy = byUser.map(u => BigInt(u._1) * u._2).sum
      val covN = (n * sxy - sx * sy).toDouble
      val vxN = (n * sxx - sx * sx).toDouble
      val vyN = (n * syy - sy * sy).toDouble
      assert(r.getAs[Long]("n_users") == byUser.length.toLong)
      if (vxN > 0) {
        assert(r.getAs[Double]("theta") == p4(covN / vxN))
        if (vyN > 0) {
          val vr = r.getAs[Double]("var_reduction")
          assert(vr == p4(covN * covN / (vxN * vyN)))
          assert(vr >= 0.0 && vr <= 1.0 + 1e-9)
        }
      }
    }
  }

  test("quality_fleiss_kappa: kappa matches the two-integer-sum " +
      "identity over the per-doc fire counts") {
    val fis = operators.Pinnacle.ruleFlags(spark, sf)
      .select((col("f0") + col("f1") + col("f2") + col("f3")).as("fi"))
      .collect().map(_.getLong(0))
    val n = fis.length.toLong
    val a = fis.sum
    val b = fis.map(f => f * f).sum
    val pbar = (b * 2 - a * 8 + n * 12).toDouble / (n * 12.0)
    val p1 = a.toDouble / (n * 4.0)
    val pe = p1 * p1 + (1.0 - p1) * (1.0 - p1)
    val r = Lattice.qualityFleissKappa(spark, sf).head()
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("total_fires") == a)
    assert(r.getAs[Double]("p_bar") == p4(pbar))
    assert(r.getAs[Double]("p_e") == p4(pe))
    if (pe < 1.0)
      assert(r.getAs[Double]("fleiss_kappa") == p4((pbar - pe) / (1 - pe)))
    // P-bar is a mean of per-item agreement shares in [0, 1]
    assert(pbar >= 0.0 && pbar <= 1.0)
  }

  test("stats_ols_2var: coefficients match a direct normal-equations " +
      "solve, residuals are orthogonal to the design, and R^2 matches " +
      "a per-row residual recomputation") {
    val rows = events.map { e =>
      val hour = (e._4 / 3600000000L) % 24
      val dow = (e._4 / 86400000000L + 4) % 7
      (e._3, hour, dow)
    }
    val n = rows.length.toLong
    def s(f: ((Long, Long, Long)) => BigInt): BigInt = rows.map(f).sum
    val (s1, s2) = (s(r => BigInt(r._2)), s(r => BigInt(r._3)))
    val (s11, s22) = (s(r => BigInt(r._2) * r._2), s(r => BigInt(r._3) * r._3))
    val s12 = s(r => BigInt(r._2) * r._3)
    val (sy, s1y, s2y) = (s(r => BigInt(r._1)),
      s(r => BigInt(r._2) * r._1), s(r => BigInt(r._3) * r._1))
    val syy = s(r => BigInt(r._1) * r._1)
    def det3(a: Array[Double]): Double =
      a(0) * (a(4) * a(8) - a(5) * a(7)) -
        a(1) * (a(3) * a(8) - a(5) * a(6)) +
        a(2) * (a(3) * a(7) - a(4) * a(6))
    val (nD, s1D, s2D, s11D, s22D, s12D) = (n.toDouble, s1.toDouble,
      s2.toDouble, s11.toDouble, s22.toDouble, s12.toDouble)
    val (syD, s1yD, s2yD, syyD) =
      (sy.toDouble, s1y.toDouble, s2y.toDouble, syy.toDouble)
    val dd = det3(Array(nD, s1D, s2D, s1D, s11D, s12D, s2D, s12D, s22D))
    val b0 = det3(Array(syD, s1D, s2D, s1yD, s11D, s12D, s2yD, s12D, s22D)) / dd
    val b1 = det3(Array(nD, syD, s2D, s1D, s1yD, s12D, s2D, s2yD, s22D)) / dd
    val b2 = det3(Array(nD, s1D, syD, s1D, s11D, s1yD, s2D, s12D, s2yD)) / dd
    // residual orthogonality: X'r ~ 0 (the defining property of OLS)
    val resid = rows.map { case (y, x1, x2) => y - b0 - b1 * x1 - b2 * x2 }
    val scale = math.max(1.0, syD.abs)
    assert(math.abs(resid.sum) / scale < 1e-9)
    assert(math.abs(rows.zip(resid).map { case (r, e) => r._2 * e }.sum)
      / scale < 1e-9)
    // per-row R^2 agrees with the normal-equations identity (to float
    // tolerance; the operator's value is the identity form r4'd)
    val sseRow = resid.map(e => e * e).sum
    val sseIdentity = syyD - b0 * syD - b1 * s1yD - b2 * s2yD
    val sst = syyD - syD * syD / nD
    val r = Lattice.statsOls2var(spark, sf).head()
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Double]("intercept_dollars") == p4(b0 / 100.0))
    assert(r.getAs[Double]("beta_hour_dollars") == p4(b1 / 100.0))
    assert(r.getAs[Double]("beta_dow_dollars") == p4(b2 / 100.0))
    val r2 = r.getAs[Double]("r_squared")
    // the operator emits the identity form EXACTLY (both engines
    // build the same tree); the per-row form differs by the expected
    // cancellation error of subtracting ~Σy²-sized terms (~1e-6 rel)
    assert(r2 == p4(1.0 - sseIdentity / sst))
    assert(math.abs(sseIdentity - sseRow) / sst < 1e-4)
    assert(r2 >= -1e-9 && r2 <= 1.0)
  }

  test("ts_seasonal_strength: matches a direct calendar-window " +
      "detrend + weekday-mean recomputation") {
    val daily = events.groupBy(e => (e._2, e._4 / 86400000000L))
      .map { case ((t, d), g) => (t, d, g.map(_._3).sum) }
      .groupBy(_._1)
    val out = Lattice.tsSeasonalStrength(spark, sf).collect()
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val series = daily(t).map(x => x._2 -> x._3).toMap
      val det = series.keys.toSeq.sorted.flatMap { d =>
        val win = (d - 3 to d + 3).flatMap(series.get)
        if (win.length == 7) Some((d, 7 * series(d) - win.sum)) else None
      }
      assert(r.getAs[Long]("n_days") == det.length.toLong)
      if (det.nonEmpty) {
        val byDow = det.groupBy { case (d, _) => (d + 4) % 7 }
          .map { case (dw, g) =>
            dw -> (g.map(x => BigInt(x._2)).sum, g.length.toLong)
          }
        def q6(x: Double): BigDecimal =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        val rs = det.map { case (d, v) =>
          val (sd, cd) = byDow((d + 4) % 7)
          v.toDouble - sd.toDouble / cd.toDouble
        }
        val nD = det.length.toDouble
        val rs1 = rs.map(q6).sum.toDouble
        val rs2 = rs.map(x => q6(x * x)).sum.toDouble
        val s1 = det.map(x => BigInt(x._2)).sum
        val s2 = det.map(x => BigInt(x._2) * x._2).sum
        val varD = s2.toDouble / nD - (s1.toDouble / nD) * (s1.toDouble / nD)
        val varR = rs2 / nD - (rs1 / nD) * (rs1 / nD)
        if (varD > 0) {
          val strength = math.max(0.0, 1.0 - varR / varD)
          assert(r.getAs[Double]("seasonal_strength") == p4(strength))
          assert(strength >= 0.0 && strength <= 1.0 + 1e-9)
        }
      }
    }
  }

  test("stats_two_proportion: counts, rates, pooled z, and the " +
      "significance flag match a direct per-user recomputation") {
    val users = Tables.eventsUs(spark, sf)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (u, g) =>
        (u, g.exists(e => e._2 == "purchase" && e._3 > 200.0))
      }
    val (a, b) = users.partition(_._1 % 2 == 0)
    val (na, nb) = (a.size.toLong, b.size.toLong)
    val (xa, xb) = (a.count(_._2).toLong, b.count(_._2).toLong)
    val r = operators.Lattice.statsTwoProportion(spark, sf).head()
    assert(r.getAs[Long]("users_a") == na)
    assert(r.getAs[Long]("users_b") == nb)
    assert(r.getAs[Long]("conv_a") == xa)
    assert(r.getAs[Long]("conv_b") == xb)
    def p4d(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val pa = xa.toDouble / na
    val pb = xb.toDouble / nb
    val pp = (xa + xb).toDouble / (na + nb)
    val z = (pb - pa) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    assert(r.getAs[Double]("rate_a") == p4d(pa))
    assert(r.getAs[Double]("rate_b") == p4d(pb))
    assert(r.getAs[Double]("z") == p4d(z))
    assert(r.getAs[Boolean]("significant_95") == (math.abs(z) > 1.96))
  }

  /** BigDecimal-quantized χ² recompute mirroring the sumDec path:
    * per-cell term as one IEEE expression over exact integers, each
    * quantized to 8 dp before summation.
    */
  private def chi2Of(cells: Map[(String, String), Long])
      : (Map[String, BigDecimal], BigDecimal) = {
    val nh = cells.groupBy(_._1._2).map { case (h, g) => h -> g.values.sum }
    val ct = cells.groupBy(_._1._1).map { case (t, g) => t -> g.values.sum }
    val nn = cells.values.sum
    val perType = cells.groupBy(_._1._1).map { case (t, g) =>
      t -> g.map { case ((_, h), o) =>
        val dnum = BigInt(o) * nn - BigInt(nh(h)) * ct(t)
        val den = (nh(h).toDouble * ct(t).toDouble) * nn.toDouble
        BigDecimal((dnum * dnum).toDouble / den)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    }
    (perType, perType.values.sum)
  }

  test("events_drift_chi2: per-type contributions and the total match " +
      "the exact-integer recompute; the undrifted stream reads no-drift") {
    val cells = events.groupBy { e =>
      (e._2, if (e._4 / 86400000000L < 19738L) "a" else "b")
    }.map { case (k, g) => k -> g.length.toLong }
    val (perType, total) = chi2Of(cells)
    val out = operators.Lattice.eventsDriftChi2(spark, sf).collect()
    assert(out.length == perType.size)
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_a") == cells.getOrElse((t, "a"), 0L))
      assert(r.getAs[Long]("n_b") == cells.getOrElse((t, "b"), 0L))
      assert(r.getAs[Double]("contrib") == p4(perType(t).toDouble))
      assert(r.getAs[Double]("chi2") == p4(total.toDouble))
      assert(r.getAs[Long]("df") == perType.size.toLong - 1)
      assert(r.getAs[Boolean]("drift_05") == (total.toDouble > 9.488))
    }
    // the synthetic mix is time-stationary — a correct monitor must
    // NOT fire here (the planted-drift leg below proves it CAN)
    assert(!out.head.getAs[Boolean]("drift_05"))
  }

  test("events_drift_chi2: a planted drifted feed fires the gate, and " +
      "the fired statistic still matches the recompute") {
    val sp = spark
    import sp.implicits._
    // half a: uniform mix; half b: type X doubles at Y's expense
    val rows =
      Seq.fill(200)(("X", "a")) ++ Seq.fill(200)(("Y", "a")) ++
        Seq.fill(200)(("Z", "a")) ++
        Seq.fill(320)(("X", "b")) ++ Seq.fill(80)(("Y", "b")) ++
        Seq.fill(200)(("Z", "b"))
    val out = operators.Lattice
      .driftChi2From(rows.toDF("event_type", "half")).collect()
    val cells = rows.groupBy(identity).map { case (k, g) =>
      k -> g.length.toLong }
    val (perType, total) = chi2Of(cells)
    assert(total.toDouble > 9.488 * 5,
      "the planted shift must be unambiguous")
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Double]("contrib") == p4(perType(t).toDouble))
      // df = 2 here (3 types) -> the df=4 critical row gates to null
      assert(r.getAs[Long]("df") == 2L)
      assert(r.isNullAt(r.fieldIndex("drift_05")))
    }
    // re-run with 5 types so the df=4 verdict column engages and fires
    val rows5 = rows ++ Seq.fill(100)(("W", "a")) ++
      Seq.fill(100)(("W", "b")) ++ Seq.fill(100)(("V", "a")) ++
      Seq.fill(100)(("V", "b"))
    val out5 = operators.Lattice
      .driftChi2From(rows5.toDF("event_type", "half")).collect()
    assert(out5.forall(_.getAs[Boolean]("drift_05")))
    assert(out5.forall(_.getAs[Long]("df") == 4L))
  }

  test("stats_perm_test: the md5 permutation ensemble, integer test " +
      "statistic, and exact rational p match a direct recomputation") {
    val ev = Tables.eventsUs(spark, sf)
      .select(col("user_id"), col("event_type"), col("value")).collect()
    val byU: Map[Long, Long] = ev.groupBy(_.getLong(0)).map {
      case (u, rs) => u -> rs.filter(_.getString(1) == "purchase")
        .map(r => cents(r.getDouble(2))).sum
    }
    val users = byU.keys.toSeq.sorted
    val n = users.length.toLong
    val na = users.count(_ % 2 == 0).toLong
    val s0 = byU.values.sum
    val sa = users.filter(_ % 2 == 0).map(byU).sum
    val tObs = ((BigInt(sa) * n) - (BigInt(s0) * na)).abs
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(x: String): String =
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var ge = 0L
    for (r <- 0 until 128) {
      val ranked = users.sortBy(u => (md5hex(s"$u:$r"), u))
      val saR = ranked.take(na.toInt).map(byU).sum
      val tR = ((BigInt(saR) * n) - (BigInt(s0) * na)).abs
      if (tR >= tObs) ge += 1
    }
    val row = Lattice.statsPermTest(spark, sf).head()
    assert(row.getAs[Long]("users_a") == na)
    assert(row.getAs[Long]("users_b") == n - na)
    assert(row.getAs[Long]("spend_a_cents") == sa)
    assert(row.getAs[Long]("spend_b_cents") == s0 - sa)
    assert(row.getAs[Long]("t_obs") == tObs.toLong)
    assert(row.getAs[Long]("p_num") == ge + 1)
    assert(row.getAs[Long]("p_den") == 129L)
    assert(row.getAs[Double]("p") == p4((ge + 1.0) / 129.0))
    // the identity permutation is in the ensemble, so p can never be 0
    assert(row.getAs[Long]("p_num") >= 1)
  }

  test("stats_holm_adjust: ranks, criticals, and the step-down verdicts " +
      "match a direct recomputation; holm is never more permissive " +
      "than the raw test") {
    val byType = events.groupBy(_._2).map { case (t, g) =>
      t -> moments(g.map(_._3))
    }
    val types = byType.keys.toSeq.sorted
    val pairs = for {
      a <- types; b <- types if a < b
      (na, sa, qa) = byType(a)
      (nb, sb, qb) = byType(b)
    } yield {
      val va = (BigInt(na) * qa - sa * sa).toDouble /
        (BigInt(na) * na * (na - 1)).toDouble
      val vb = (BigInt(nb) * qb - sb * sb).toDouble /
        (BigInt(nb) * nb * (nb - 1)).toDouble
      val t: Option[Double] =
        if (na > 1 && nb > 1 && va + vb > 0)
          Some((sa.toDouble / na - sb.toDouble / nb) / math.sqrt(va + vb))
        else None
      (a, b, t)
    }
    val crits = Array(1.959964, 2.241403, 2.39398, 2.497705, 2.575829,
      2.638257, 2.69011, 2.734369, 2.772921, 2.807034)
    val mTested = pairs.count(_._3.isDefined)
    val ranked = pairs.sortBy { case (a, b, t) =>
      (t.isEmpty, -t.map(_.abs).getOrElse(0.0), a, b)
    }.zipWithIndex
    var runPass = true
    val expect = ranked.map { case ((a, b, t), i) =>
      val rank = i + 1
      val crit = t.map(_ => crits(mTested - rank))
      val pass = t.map(x => x.abs > crit.get)
      if (t.isDefined) runPass = runPass && pass.get
      (a, b) -> ((t.map(p4), rank.toLong, crit,
        t.map(x => x.abs > 1.959964),
        if (t.isDefined) Some(runPass) else None))
    }.toMap
    val out = Lattice.statsHolmAdjust(spark, sf).collect()
    assert(out.length == pairs.length && out.length == 10)
    out.foreach { r =>
      val k = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val (t, rank, crit, raw, holm) = expect(k)
      assert(Option(r.getAs[java.lang.Double]("t_stat"))
        .map(_.doubleValue) == t, s"t for $k")
      assert(r.getAs[Long]("rank") == rank, s"rank for $k")
      assert(Option(r.getAs[java.lang.Double]("crit"))
        .map(_.doubleValue) == crit, s"crit for $k")
      assert(Option(r.getAs[java.lang.Boolean]("raw_sig_95"))
        .map(_.booleanValue) == raw, s"raw flag for $k")
      assert(Option(r.getAs[java.lang.Boolean]("holm_sig_95"))
        .map(_.booleanValue) == holm, s"holm flag for $k")
      // FWER control direction: the corrected verdict can only revoke
      (Option(r.getAs[java.lang.Boolean]("holm_sig_95")),
       Option(r.getAs[java.lang.Boolean]("raw_sig_95"))) match {
        case (Some(h), Some(rw)) => assert(!h || rw)
        case _ => ()
      }
    }
  }

  test("stats_bh_adjust: step-up criticals are the z(0.05k/2m) table, " +
      "the rejection set CONTAINS Holm's (BH dominance), and rank " +
      "m_tested tests at the raw 1.959964") {
    val bh = operators.Lattice.statsBhAdjust(spark, sf).collect()
    val holm = operators.Lattice.statsHolmAdjust(spark, sf).collect()
    assert(bh.nonEmpty && bh.length == holm.length)
    def sig(rows: Array[org.apache.spark.sql.Row],
        c: String): Set[(String, String)] =
      rows.filter(r => !r.isNullAt(r.fieldIndex(c)) && r.getAs[Boolean](c))
        .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")))
        .toSet
    assert(sig(holm, "holm_sig_95").subsetOf(sig(bh, "bh_sig_95")),
      "BH rejected fewer pairs than Holm - step-up dominance broken")
    val tested = bh.filter(!_.isNullAt(bh.head.fieldIndex("t_stat")))
    val m = tested.length.toLong
    tested.foreach { r =>
      val crit = r.getAs[Double]("crit")
      if (r.getAs[Long]("rank") == m)
        assert(math.abs(crit - 1.959964) < 1e-9,
          "rank m_tested must test at the unadjusted critical")
      if (r.getAs[Long]("rank") == 1L && m == 10L)
        assert(math.abs(crit - 2.807034) < 1e-9,
          "rank 1 of 10 must test at the Bonferroni critical")
      // step-up criticals decrease with rank; every BH critical is at
      // most Holm's for the same rank (the dominance witness)
      assert(crit >= 1.959964 - 1e-9)
    }
  }
}
