package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, Relational}

/** Semantic contracts for the corpus-quality / monitoring operators
  * (#78-83) beyond the generic QueriesSpec smoke: redaction counts hit
  * exactly the injected identifiers, the filter funnel is internally
  * consistent, salting does not change the join answer, and anomaly
  * z-scores respect the threshold.
  */
class QualitySpec extends GraftSpec {

  test("pii scrub counts exactly the injected identifiers") {
    val rows = Quality.textPiiScrub(spark, sf)
      .select("doc_id", "n_emails", "n_ips").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, em, ip) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(em == (if (id % 7 == 0) 1L else 0L), s"doc $id emails=$em")
      assert(ip == (if (id % 11 == 0) 1L else 0L), s"doc $id ips=$ip")
    }
  }

  test("filter cascade funnel is internally consistent") {
    val rows = Quality.filterCascade(spark, sf)
      .orderBy("rule_id")
      .select("n_in", "n_dropped", "n_out").collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(0) - r.getLong(1)))
    // each rule's survivors are exactly the next rule's input
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) == b.getLong(0))
    }
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.head.getLong(0) == nDocs)
  }

  test("salted join equals the plain join") {
    val salted = Relational.joinSalted(spark, sf)
    val plain = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
      .select("o_orderpriority", "n_lines")
    assert(salted.select("o_orderpriority", "n_lines").collect().toSeq ==
      plain.collect().toSeq)
  }

  test("anomaly rows respect the 2-sigma threshold") {
    val zs = Quality.eventsAnomaly(spark, sf)
      .select("z").collect().map(_.getDouble(0))
    assert(zs.nonEmpty)
    // z is emitted 4dp-rounded; threshold is on the unrounded value
    zs.foreach(z => assert(math.abs(z) > 1.9999, s"z=$z under threshold"))
  }

  test("zipf ranks are contiguous and shares non-increasing") {
    val rows = Quality.textZipf(spark, sf)
      .select("rank", "share").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    val shares = rows.map(_.getDouble(1)).toSeq
    assert(shares == shares.sorted.reverse)
  }

  test("rarity mean inverse frequency is at least 1") {
    val rows = Quality.textRarity(spark, sf)
      .select("rarity_mean", "rarity_max").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) >= 1.0)
      assert(r.getDouble(1) >= r.getDouble(0) - 1e-9)
    }
  }

  test("text_pii_luhn: planted valid cards validate, broken checksums " +
      "fail, untouched docs carry no runs, and an independent Scala " +
      "Luhn agrees with the planted check digits") {
    def luhnOk(s: String): Boolean =
      s.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum % 10 == 0
    val out = operators.Quality.textPiiLuhn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val v = r.getAs[Long]("n_luhn_valid")
      val iv = r.getAs[Long]("n_luhn_invalid")
      assert(r.getAs[Long]("n_card_runs") == v + iv)
      assert(v == (if (id % 5 == 0) 1L else 0L),
        s"doc $id: valid-card count $v")
      assert(iv == (if (id % 13 == 0) 1L else 0L),
        s"doc $id: broken-card count $iv")
      if (id % 5 == 0) {
        // re-derive the planted number; the independent Luhn must
        // accept exactly the operator's check digit and reject +5
        val pay = f"${(id * 7919) % 1000000000000000L}%015d"
        val chk = (0 to 9).find(c => luhnOk(pay + c.toString)).get
        assert(!luhnOk(pay + ((chk + 5) % 10).toString))
      }
    }
    assert(out.exists(_.getAs[Long]("n_luhn_valid") > 0))
    assert(out.exists(_.getAs[Long]("n_luhn_invalid") > 0))
  }
}
