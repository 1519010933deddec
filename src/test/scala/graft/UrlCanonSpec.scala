package graft

import org.apache.spark.sql.functions._
import graft.operators.Catalog

/** #334/#335: URL canonicalization + host rollup against a PLANTED
  * corpus where every collision and gate outcome is known by hand.
  */
class UrlCanonSpec extends GraftSpec {

  /** Two 3-doc variant groups; group 0's texts carry an exact dup. */
  private lazy val dir: String = {
    val sp = spark
    import sp.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_url").toString
    Seq(
      // gid 0 → host cdn0.site0.com, page-0; docs 0,1 share text
      (0L, "src0", "same text body here", 300L),
      (1L, "src1", "same text body here", 300L),
      (2L, "src2", "a different text body", 300L),
      // gid 1 → host cdn1.site1.com, page-1; short docs (gate fails)
      (3L, "src3", "t one", 100L),
      (4L, "src4", "t two", 100L),
      (5L, "src5", "t three", 100L))
      .toDF("doc_id", "source", "text", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("every planted spelling variant canonicalizes to the hand-" +
      "computed form: case/www/query/fragment/percent/dot-segment " +
      "all collapse, path case survives") {
    val rows = Catalog.canonicalized(spark, dir)
      .select("doc_id", "u_raw", "canonical_url").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val c0 = "https://cdn0.site0.com/docs/page-0.html"
    val c1 = "https://cdn1.site1.com/docs/page-1.html"
    // raw spellings really are three DIFFERENT strings per group
    assert(Seq(0L, 1L, 2L).map(rows(_)._1).distinct.size == 3)
    // variant 1 carries the junk the canonicalizer must strip
    assert(rows(1L)._1.startsWith("HTTPS://WWW.") &&
      rows(1L)._1.contains("?utm_source=") && rows(1L)._1.contains("#"))
    // variant 2 carries the percent-encoding and the dot segment
    assert(rows(2L)._1.contains("%61") && rows(2L)._1.contains("/../"))
    Seq(0L, 1L, 2L).foreach(id => assert(rows(id)._2 == c0,
      s"doc $id: ${rows(id)._2} != $c0"))
    Seq(3L, 4L, 5L).foreach(id => assert(rows(id)._2 == c1))
  }

  test("url_canonicalize groups the planted collisions exactly") {
    val out = Catalog.urlCanonicalize(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size == 2)
    assert(out("https://cdn0.site0.com/docs/page-0.html") == (3L, 3L, 0L))
    assert(out("https://cdn1.site1.com/docs/page-1.html") == (3L, 3L, 3L))
  }

  test("url_host_rollup computes the planted dup rates and the gate " +
      "fires on BOTH planted outcomes") {
    val out = Catalog.urlHostRollup(spark, dir).collect()
      .map(r => r.getAs[String]("host") -> r).toMap
    assert(out.keySet == Set("cdn0.site0.com", "cdn1.site1.com"))
    val h0 = out("cdn0.site0.com")
    // 3 docs, 1 page, 2 distinct texts
    assert(h0.getAs[Long]("n_docs") == 3 && h0.getAs[Long]("n_pages") == 1)
    assert(h0.getAs[Double]("url_dup_rate") == 0.6667)
    assert(h0.getAs[Double]("text_dup_rate") == 0.3333)
    assert(h0.getAs[Double]("avg_chars") == 300.0)
    assert(h0.getAs[Boolean]("keep"), "long-doc host must pass the gate")
    val h1 = out("cdn1.site1.com")
    assert(h1.getAs[Double]("avg_chars") == 100.0)
    assert(!h1.getAs[Boolean]("keep"), "short-doc host must fail the gate")
  }
}
