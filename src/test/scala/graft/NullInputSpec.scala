package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-value robustness: operators must survive ROWS with null
  * text / null embedding (the other degenerate-input axis from
  * EmptyInputSpec's zero-row tables — in production these are the
  * upstream extraction failures that always exist at 100 TB). The
  * contract: no throw, and null-content rows neither crash the
  * pipeline nor fabricate results (they may legitimately be absent
  * from output or grouped under a null key).
  */
class NullInputSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  /** Real testdata with 2 null-text docs and 1 null-embedding vector
    * appended (fresh ids so joins stay consistent).
    */
  private lazy val nulledDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    Tables.names.foreach { n =>
      val base = Tables(spark, TestSpark.sf, n)
      val out = n match {
        case "documents" =>
          val nulls = base.limit(2)
            .withColumn("doc_id", col("doc_id") + lit(900000L))
            .withColumn("text", lit(null).cast("string"))
          base.unionByName(nulls)
        case "embeddings" =>
          val nulls = base.limit(1)
            .withColumn("vec_id", col("vec_id") + lit(900000L))
            .withColumn("embedding",
              lit(null).cast("array<float>"))
          base.unionByName(nulls)
        case _ => base
      }
      out.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  private val representative = Seq(
    // text-heavy: tokenizers, hashes, regex normalization
    "dedup_exact", "dedup_norm", "dedup_minhash_lsh", "text_stats",
    "text_quality_classifier", "text_bm25", "text_collocations",
    "text_perplexity", "split_leakage_safe", "pipeline_clean_corpus",
    // embedding-heavy: distance/signature arithmetic
    "ann_bruteforce", "ann_lsh", "dedup_embedding", "kmeans_lloyd",
    "embed_pca_power", "ann_recall_at_k",
    // round-9 additions: entropy/rank arithmetic over null text,
    // order stats over a null vector, calibration signatures
    "text_entropy", "quality_ensemble", "corpus_epoch_plan",
    "sample_fixed_k", "dedup_minhash_est", "embed_dim_stats",
    "text_source_jaccard", "mix_curriculum", "ann_mmr",
    "dedup_threshold_sweep", "embed_label_drift", "text_script_profile",
    "mm_audio_features", "dedup_prefix", "corpus_vocab_growth",
    // round-10 additions: KN/bigram arithmetic over null text, null
    // pred_lang confusion cell, classifier-vs-cascade join with the
    // null doc dropped on one side, chunking skips nulls, clip
    // profile over a null vector
    "text_kneser_ney", "text_langid_eval", "quality_classifier_eval",
    "corpus_chunks", "embed_quantile_clip",
    "corpus_length_histogram", "corpus_hapax_rate", "embed_pq_distortion",
    "quality_signal_corr", "corpus_ngram_coverage", "text_boilerplate",
    // round-11 additions: chunk devices skip null text; centroid
    // sums/counts both exclude the null vector (guard in the
    // operator); the probe dial's bucket/cosine exprs see a null
    // query embedding when the null vec_id lands on the eval stride
    // round-22 additions: the two Viterbi encoders and the packer
    // drop null-text docs at the word explode; the Luhn scrub carries
    // them with null counts; the JL projection and the dedup impact
    // see a null embedding / null-text doc without fabricating rows
    "corpus_unigram_encode", "corpus_unigram_vocab_sweep",
    "corpus_tokenizer_eval", "pack_sequences_binned", "text_pii_luhn",
    "embed_jl_project", "dedup_token_impact",
    "corpus_novelty", "dedup_source_matrix", "embed_centroid_sim",
    "ann_probe_dial",
    // batch 2: hash profile skips null text (guard), moments skip the
    // null vector, calibration joins the null doc out on both sides
    "corpus_dup_profile", "embed_dim_moments", "quality_calibration",
    // batch 3: the >= 3-token shingle filter drops null text, the
    // kNN bucket exprs see the null vector, packing guards null text
    "dedup_banding_sweep", "embed_label_consistency",
    "corpus_pack_efficiency",
    // batch 4: token-mass guard drops null text
    "mix_achieved_shares",
    // batch 5: both flag flows tokenize null text away
    "decontamination_report",
    // batch 8: the length-drift halves guard null text
    "corpus_length_drift",
    // round-12: rule flags evaluate null text to 0 (no fabricated
    // fires); the label-scoped join and SQ8 quantization both see the
    // null embedding (null cosine ranks last, never crashes)
    "quality_rule_overlap", "ann_filtered", "ann_rerank",
    // round-13: the shot-boundary and VAD legs are pixels/samples-true
    // since round 19 and key off doc_id only (a null-text row still
    // plants and decodes its frames/WAV); the null
    // embedding's null bucket joins out of the kNN graph and a
    // null-embedding query ranks its null cosines last; rule flags
    // evaluate null text to 0 for κ and the cascade pricing; null
    // tokens never reach the vocabulary
    "mm_shot_boundaries", "mm_audio_vad", "ann_graph_search",
    "quality_rule_kappa", "quality_cascade_plan", "text_vocab_gini",
    // md5(null text) groups out (null never equals), null embedding
    // joins out of the conflict pairs; structural regex counts of
    // null text are null-flagged rows, never throws
    "embed_text_conflict", "text_code_detect",
    // the null embedding's null signature/cosine ranks last or joins
    // out; slice(null) stays null in the prefix ranking
    "ann_binary_hamming", "embed_matryoshka_eval",
    // null text yields an empty bigram list (coverage row with zero
    // grams); the null doc still ranks in its class by id hash
    "text_template_coverage", "sample_class_balanced",
    // round-14: the real-codec legs key off doc_id only — a null text
    // row still plants, encodes and decodes its BMPs; the Shapley
    // gates evaluate null text to all-pass flags (no fabricated fires)
    "mm_image_resize", "mm_image_phash", "quality_rule_shapley",
    // round-15: the >= 3-token shingle guard drops null text from the
    // HLL read (split(null) is null, size(null) = -1); the luminance
    // histogram keys off doc_id only, so a null-text row still decodes
    "agg_hll_distinct", "mm_image_hist",
    // round-16: the Sobel leg keys off doc_id only
    "mm_image_edges",
    // round-17: rule flags evaluate null text without fabricating
    // fires, so the rater counts stay consistent
    "quality_fleiss_kappa",
    // round-18: the WAV leg keys off doc_id only
    "mm_audio_pcm_energy",
    // round-20: split(null) explodes away in the BPE word stream, so
    // encode/budget/mixture twins simply omit the null doc; URL
    // synthesis keys off source/doc_id (null text only moves the
    // host's text-dup rate); the null embedding joins out of the
    // frozen-centroid assignment
    "corpus_bpe_encode", "mix_domains_tokened", "url_host_rollup",
    "ann_ivf_incremental",
    // round-20 batch 2: split(null) drops the null doc from every
    // sweep budget's word stream (totals just shrink, never null);
    // the null embedding's null cosine ranks last in the recluster
    // argmin (deterministic cell tie-break) and drops from centroids
    "corpus_bpe_vocab_sweep", "ann_ivf_recluster",
    // round-21: size(null ws) = -1 < 3 drops the null doc from the
    // shingle table (exact pair set unchanged); the perm test and the
    // bloom lookup read events/orders, untouched by the nulled corpus
    "dedup_allpairs_exact", "stats_perm_test", "layout_bloom_scan",
    // round-21 batch 2: the null embedding is filtered before the
    // greedy (isNotNull guard mirrored in the oracle); the evolution
    // layout reads orders, untouched by the nulled corpus
    "sample_coreset", "layout_schema_evolution", "stats_holm_adjust",
    "agg_moments_skew", "join_pit_features", "agg_winsorized_mean",
    // round-23: split(null) drops the null doc from both the role
    // vocabulary learn and the greedy encode word stream
    "corpus_wordpiece_encode", "corpus_wordpiece_vocab_sweep",
    // the isNotNull guard drops null text before the token count
    // (size(split(null)) = -1 would corrupt the mass)
    "mix_temperature")

  for (name <- representative)
    test(s"$name survives null text / null embedding rows") {
      val rows = SparkEntry.queries(name)(spark, nulledDir).collect()
      // the base corpus is intact underneath, so output never collapses
      assert(rows.nonEmpty, s"$name returned nothing on the nulled corpus")
    }

  test("quality_profile COUNTS the planted nulls (null accounting is " +
      "the profiler's job, not just survival)") {
    val rows = SparkEntry.queries("quality_profile")(spark, nulledDir)
      .collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val t = rows("text")
    assert(t.getAs[Long]("n_nulls") == 2L)
    assert(t.getAs[Double]("completeness") < 1.0)
    // null text never reaches the sketch: approx_distinct counts only
    // present values
    assert(rows("doc_id").getAs[Long]("n_nulls") == 0L)
  }

  test("quality_constraints flags the planted null texts: the " +
      "completeness_text metric drops below 1.0 but stays above the " +
      "0.99 floor at 2/502 nulls") {
    val rows = SparkEntry.queries("quality_constraints")(spark, nulledDir)
      .collect()
      .map(r => r.getAs[String]("check_name") -> r).toMap
    val ct = rows("completeness_text")
    assert(ct.getAs[Double]("metric") < 1.0)
    assert(ct.getAs[Boolean]("passed"), "2/502 is above the 0.99 floor")
    // consistency check only judges rows where BOTH sides exist —
    // null text rows don't fabricate inconsistencies
    assert(rows("consistency_n_chars").getAs[Boolean]("passed"))
  }
}
