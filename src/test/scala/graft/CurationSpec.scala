package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}

/** Invariant specs for the batch-2 round-8 additions (#165-169).
  * Value-level correctness is the DuckDB oracle's job
  * (tools/check.py); these pin the structural and semantic contracts.
  */
class CurationSpec extends GraftSpec {

  test("text_bm25: ranked lists are contiguous, sorted, term-grounded, " +
      "never self-retrieving") {
    val r = Curation.textBm25(spark, sf).collect()
    assert(r.nonEmpty)
    // no self-retrieval, every hit matched >= 1 query term, scores >= 0
    assert(r.forall(x => x.getAs[Long]("q_id") != x.getAs[Long]("doc_id")))
    assert(r.forall(_.getAs[Long]("terms_hit") >= 1))
    assert(r.forall(_.getAs[Long]("score") >= 0))
    r.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      // ranks 1..n with no gaps; scores non-increasing in rank order
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
        (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getAs[Long]("score")).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("text_bm25: retrieved docs really contain a query term") {
    // ground the posting-list join: re-derive membership from raw text
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val hits = Curation.textBm25(spark, sf)
    val qt = docs.where(col("doc_id") % 101 === 0)
      .select(col("doc_id").as("q_id"), explode(col("toks")).as("token"))
      .distinct()
    val grounded = hits
      .join(docs, "doc_id")
      .join(qt, Seq("q_id"))
      .where(array_contains(col("toks"), col("token")))
      .select("q_id", "doc_id").distinct()
    assert(hits.join(grounded, Seq("q_id", "doc_id"), "left_anti")
      .count() == 0)
  }

  test("text_quality_classifier: label matches weight-sum sign and " +
      "token counts match the text") {
    val c = Curation.textQualityClassifier(spark, sf)
    assert(c.where((col("sum_w") >= 0 && col("label") =!= "keep") ||
      (col("sum_w") < 0 && col("label") =!= "drop")).count() == 0)
    val expect = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("exp_n"))
    assert(c.join(expect, "doc_id")
      .where(col("n_tokens") =!= col("exp_n")).count() == 0)
  }

  test("ann_ivf_pq: contiguous ranks, monotone approx distance, " +
      "candidates confined to probed cells") {
    val r = Curation.annIvfPq(spark, sf).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
        (1L to byRank.length).toSeq)
      val d = byRank.map(_.getAs[Double]("approx_dist")).toSeq
      assert(d == d.sorted)
    }
    assert(r.forall(x => math.abs(x.getAs[Double]("cosine_exact")) <= 1.0))
    // cell confinement: every emitted candidate's label is one of its
    // query's 2 probed cells — fewer distinct labels per query than the
    // corpus has cells proves the IVF restriction actually bit
    val v = Tables(spark, sf, "embeddings")
      .select(col("vec_id").as("c_id"), col("label"))
    val df = Curation.annIvfPq(spark, sf).join(v, "c_id")
    val maxCells = df.groupBy("q_id")
      .agg(countDistinct("label").as("cells"))
      .agg(max("cells")).head().getLong(0)
    assert(maxCells <= 2, s"candidates leaked outside probed cells: $maxCells")
  }

  test("corpus_temperature_mix: weights form a distribution and " +
      "flatten the source histogram") {
    val m = Curation.corpusTemperatureMix(spark, sf).collect()
    assert(m.nonEmpty)
    val wsum = m.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) <= 1e-3 * m.length,
      s"weights sum to $wsum")
    // temperature < 1 upweights small sources: the smallest source's
    // upsample factor must exceed the largest source's
    val bySize = m.sortBy(_.getAs[Long]("n_tokens"))
    assert(bySize.head.getAs[Double]("upsample") >
      bySize.last.getAs[Double]("upsample"))
    // and the largest source is downweighted vs natural sampling
    assert(bySize.last.getAs[Double]("upsample") <= 1.0 + 1e-9)
  }

  test("text_collocations: support floor holds and the ranking is the " +
      "documented total order") {
    val r = Curation.textCollocations(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 100)
    assert(r.forall(_.getAs[Long]("c12") >= 2))
    val keys = r.map(x => (-x.getAs[Long]("pmi_bits"), -x.getAs[Long]("c12"),
      x.getAs[String]("w1"), x.getAs[String]("w2"))).toSeq
    assert(keys == keys.sorted)
  }

  test("text_collocations: pmi_bits is the integer-bits ratio of the " +
      "raw corpus counts") {
    // re-derive one emitted pair's counts straight from the text and
    // recompute floor(log2((c12*N) div (c1*c2)))
    val top = Curation.textCollocations(spark, sf).head()
    val (w1, w2) = (top.getAs[String]("w1"), top.getAs[String]("w2"))
    val bg = Tables(spark, sf, "documents")
      .select(split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(t) - 1),
          |  i -> struct(element_at(t, i) AS w1,
          |              element_at(t, i + 1) AS w2))""".stripMargin)).as("p"))
      .select("p.w1", "p.w2")
    val n = bg.count()
    val c12 = bg.where(col("w1") === w1 && col("w2") === w2).count()
    val c1 = bg.where(col("w1") === w1).count()
    val c2 = bg.where(col("w2") === w2).count()
    val ratio = math.max(c12 * n / (c1 * c2), 1L)
    val expectBits = 63 - java.lang.Long.numberOfLeadingZeros(ratio)
    assert(top.getAs[Long]("c12") == c12)
    assert(top.getAs[Long]("pmi_bits") == expectBits,
      s"pair ($w1,$w2): c12=$c12 c1=$c1 c2=$c2 n=$n")
  }

  test("ann_hard_negatives: every negative has a different label and " +
      "similarity is rank-monotone") {
    val v = Tables(spark, sf, "embeddings")
    val withLabels = Curation.annHardNegatives(spark, sf)
      .join(v.select(col("vec_id").as("q_id"),
        col("label").cast("long").as("q_label")), "q_id")
    assert(withLabels.count() > 0)
    assert(withLabels.where(col("neg_label") === col("q_label")).count() == 0)
    withLabels.collect().groupBy(_.getAs[Long]("q_id")).foreach {
      case (_, rows) =>
        val byRank = rows.sortBy(_.getAs[Long]("rank"))
        assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
          (1L to byRank.length).toSeq)
        val cos = byRank.map(_.getAs[Double]("cosine")).toSeq
        assert(cos == cos.sorted.reverse)
    }
  }

  test("split_leakage_safe: normalized duplicates can never straddle " +
      "the split boundary") {
    val s = Curation.splitLeakageSafe(spark, sf)
    // every cluster maps to exactly one split
    assert(s.groupBy("cluster_rep")
      .agg(countDistinct("split").as("k"))
      .where(col("k") =!= 1).count() == 0)
    // the representative is a member of its own cluster
    assert(s.where(col("doc_id") === col("cluster_rep")).count() ==
      s.select("cluster_rep").distinct().count())
    // both splits exist and train dominates (90/10 by cluster hash)
    val frac = s.where(col("split") === "train").count().toDouble / s.count()
    assert(frac > 0.6 && frac < 1.0, s"train fraction $frac")
  }

  test("ann_recall_at_k: recall is overlap over truth and the bounds hold") {
    val r = Curation.annRecallAtK(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (t, h, o) = (x.getAs[Long]("n_truth"), x.getAs[Long]("n_hits"),
        x.getAs[Long]("n_overlap"))
      assert(o <= math.min(t, h), s"overlap $o exceeds min($t, $h)")
      val rec = x.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - math.floor(o.toDouble / t * 10000 + 0.5) / 10000)
        < 1e-12)
    }
    // one row per query vector (queries with an empty bucket — likely
    // at this tiny sf with 256 buckets over 20 vectors — still report,
    // with zero hits); truth is always full-k on a >k corpus
    val nQueries = Tables(spark, sf, "embeddings")
      .where(col("vec_id") % 50 === 0).count()
    assert(r.length == nQueries)
    assert(r.forall(_.getAs[Long]("n_truth") == 3L))
  }

  test("graph_kcore: minimum degree >= k and 3 rounds reach the fixpoint") {
    val core = Curation.graphKcore(spark, sf)
    assert(core.where(col("deg") < 3).count() == 0)
    // one extra peel round removes nothing — the peeling converged
    val more = Curation.graphKcore(spark, sf, k = 3, rounds = 4)
    assert(core.join(more, Seq("node", "deg"), "left_anti").count() == 0)
    assert(core.count() == more.count())
  }
}
