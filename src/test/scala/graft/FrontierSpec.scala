package graft

import org.apache.spark.sql.functions._
import graft.operators.Frontier

/** Invariant specs for the round-8 additions (#160-164). Value-level
  * correctness is the DuckDB oracle's job (tools/check.py); these pin
  * the structural and semantic contracts.
  */
class FrontierSpec extends GraftSpec {

  test("text_perplexity: one row per multi-token doc; bits consistent") {
    val docs = Tables(spark, sf, "documents")
      .where(size(split(col("text"), " ")) >= 2)
    val p = Frontier.textPerplexity(spark, sf)
    assert(p.count() == docs.count())
    // n_bigrams = token count - 1 for every doc
    val expect = docs.select(col("doc_id"),
      (size(split(col("text"), " ")) - 1).cast("long").as("exp_n"))
    assert(p.join(expect, "doc_id")
      .where(col("n_bigrams") =!= col("exp_n")).count() == 0)
    // every surprisal is ≥ 0 bits and the mean is within [0, 64]
    assert(p.where(col("bits_total") < 0 ||
      col("bits_per_bigram") < 0 || col("bits_per_bigram") > 64)
      .count() == 0)
  }

  test("text_perplexity: a repeated-boilerplate doc scores under a " +
      "rare-transition doc") {
    // The corpus-level LM sees every bigram of every doc, so a doc made
    // of the corpus's own most common transitions must cost fewer bits
    // than the doc containing the corpus's rarest. Proxy: compare the
    // min- and max-scoring docs' mean bigram corpus-frequency.
    val p = Frontier.textPerplexity(spark, sf)
    val lo = p.orderBy(col("bits_per_bigram")).limit(1)
      .select(col("bits_per_bigram")).head().getDouble(0)
    val hi = p.orderBy(desc("bits_per_bigram")).limit(1)
      .select(col("bits_per_bigram")).head().getDouble(0)
    assert(lo < hi, s"degenerate spread: lo=$lo hi=$hi")
  }

  test("corpus_quality_buckets: partition of scored docs, " +
      "non-overlapping score ranges") {
    val b = Frontier.corpusQualityBuckets(spark, sf).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(b.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L))
    val total = b.map(_.getAs[Long]("n_docs")).sum
    assert(total == Frontier.textPerplexity(spark, sf).count())
    // tertile ranges are ordered: head.max <= middle.min etc. (ties on
    // the boundary value are legal — ntile splits by row, not value)
    for (i <- 0 until 2)
      assert(b(i).getAs[Double]("max_bits") <=
        b(i + 1).getAs[Double]("min_bits") + 1e-9)
  }

  test("corpus_dsir_weights: target-language docs score higher on average") {
    // The defining DSIR property: documents FROM the target distribution
    // carry higher importance weights than off-target documents.
    val w = Frontier.corpusDsirWeights(spark, sf)
    val m = w.groupBy(col("lang") === "en")
      .agg(avg("dsir_weight").as("mean_w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      s"en mean ${m(true)} !> other mean ${m(false)}")
  }

  test("graph_lpa: communities refine or equal components; sizes consistent") {
    val lpa = Frontier.graphLpa(spark, sf)
    val sizeBad = lpa.groupBy("community")
      .agg(count(lit(1)).as("n"), max("community_size").as("sz"),
        min("community_size").as("sz2"))
      .where(col("n") =!= col("sz") || col("sz") =!= col("sz2"))
    assert(sizeBad.count() == 0, "community_size disagrees with member count")
    // every LPA community lives inside ONE connected component (label
    // propagation never crosses a disconnected cut)
    val comp = operators.Advanced.graphComponents(spark, sf)
      .select(col("node_id"), col("cluster_root"))
    val crossing = lpa.join(comp, "node_id")
      .groupBy("community")
      .agg(countDistinct("cluster_root").as("n_comp"))
      .where(col("n_comp") > 1)
    assert(crossing.count() == 0, "an LPA community spans components")
  }

  test("embed_pca_power: projection magnitudes dominate any single axis") {
    // Rayleigh-quotient sanity: the power-iteration direction must
    // capture at least as much (uncentered) variance as the best single
    // coordinate axis — Σ proj² ≥ max_j Σ x_j². Run both sides through
    // the same decimal reduction so the comparison is exact.
    val ex = Tables.spread(spark, sf, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("j", "xf")))
      .select(col("vec_id"), col("j"), col("xf").cast("double").as("x"))
    val axisBest = ex.groupBy("j")
      .agg(Exprs.sumDec(col("x") * col("x"), 38, 18).as("ss"))
      .agg(max("ss")).head().getDouble(0)
    val projSs = Frontier.embedPcaPower(spark, sf)
      .agg(Exprs.sumDec(col("pc1_proj") * col("pc1_proj"), 38, 18))
      .head().getDouble(0)
    // pc1_proj is r4'd, so allow the rounding slack
    assert(projSs >= axisBest * 0.999,
      s"pc1 captured $projSs < best axis $axisBest")
  }

  test("embed_pca_power: one projection per vector, finite values") {
    val p = Frontier.embedPcaPower(spark, sf)
    assert(p.count() == Tables(spark, sf, "embeddings").count())
    assert(p.where(isnan(col("pc1_proj")) || col("pc1_proj").isNull)
      .count() == 0)
  }
}
