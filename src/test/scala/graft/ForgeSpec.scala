package graft

import graft.operators.Forge

/** Round-19 widening invariants. */
class ForgeSpec extends GraftSpec {

  test("layout_zorder_footer: z-order skips on BOTH dimensions where " +
      "the single-key layout only skips on its sort key — measured " +
      "from REAL footers") {
    val rows = Forge.layoutZorderFooter(spark, sf).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("probe")) ->
        r.getAs[Double]("skip_frac")).toMap
    assert(rows.size == 6)
    // the date-clustered layout answers day probes nearly for free...
    assert(rows(("date_clustered", "day_1995-03")) >= 0.9)
    // ...but the customer probe reads nearly everything (tiny files
    // can miss a bucket by luck; at real file sizes this is 0.0)
    assert(rows(("date_clustered", "cust_bucket_7")) <= 0.2)
    // z-order trades a little day selectivity for genuine skipping on
    // BOTH dimensions — the multi-predicate clustering argument
    assert(rows(("zorder", "day_1995-03")) >= 0.5)
    assert(rows(("zorder", "cust_bucket_7")) >= 0.5)
    assert(rows(("zorder", "combined")) >= 0.9)
    assert(rows(("zorder", "cust_bucket_7")) >
      rows(("date_clustered", "cust_bucket_7")) + 0.3)
  }
}
