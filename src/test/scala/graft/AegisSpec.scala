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
}
