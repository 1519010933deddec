package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the corpus-preparation ops (SURVEY §2
  * #64-67) that the hash-oracle can't express.
  */
class CorpusSpec extends GraftSpec {

  test("text_repetition: fractions bounded, bigram count = tokens - 1") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1)
        .cast("long").as("expect_bigrams"))
    val rep = operators.Corpus.textRepetition(spark, sf)
    val joined = rep.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == r.getAs[Long]("expect_bigrams"))
      val dup = r.getAs[Double]("dup_frac")
      val top = r.getAs[Double]("top_frac")
      assert(dup >= 0.0 && dup < 1.0)
      assert(top > 0.0 && top <= 1.0)
      // the top bigram is itself a duplicate witness: if any bigram
      // repeats (top_cnt >= 2), dup_frac must be positive (1e-4 slack
      // because both fractions are rounded to 4dp)
      if (top > 1.0 / r.getAs[Long]("n_bigrams") + 1e-4) assert(dup > 0.0)
    }
  }

  test("decontaminate: flagged docs truly share a 5-gram; src0 never flagged") {
    val flagged = operators.Corpus.decontaminate(spark, sf)
    assert(flagged.count() > 0)
    // no benchmark doc flags itself
    val srcOf = Tables(spark, sf, "documents").select("doc_id", "source")
    assert(flagged.join(srcOf, "doc_id")
      .where(col("source") === "src0").count() == 0)
    // string-level re-verification of a sample: every flagged doc shares
    // at least one literal 5-gram with some src0 doc
    val g = Tables(spark, sf, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("source"), explode(expr(
        """transform(sequence(1, size(toks) - 4),
          |  i -> concat_ws(' ', slice(toks, i, 5)))""".stripMargin))
        .as("gram"))
    val stringHits = g.where(col("source") =!= "src0").as("c")
      .join(g.where(col("source") === "src0").as("b"),
        col("c.gram") === col("b.gram"))
      .select(col("c.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val hashHits = flagged.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(hashHits == stringHits)
  }

  test("pack_sequences: chunk ids are non-decreasing prefix sums per source") {
    val packed = operators.Corpus.packSequences(spark, sf).collect()
    assert(packed.nonEmpty)
    packed.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getLong(1))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getLong(3) == cum / 2048, s"chunk mismatch at $r")
        cum += r.getLong(2)
      }
    }
  }

  test("dedup_passages: exact-duplicate docs share every passage") {
    val rep = operators.Corpus.dedupPassages(spark, sf)
    val rows = rep.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_passages"))
      val f = r.getAs[Double]("shared_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
    // string-level reverification: the docs the operator flags
    // (n_shared > 0) are EXACTLY the docs sharing a literal 8-token
    // aligned chunk with another doc
    val p = Tables(spark, sf, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) div 8),
          |  i -> concat_ws(' ', slice(toks, (i - 1) * 8 + 1, 8)))"""
          .stripMargin)).as("chunk"))
    val stringFlagged = p.as("a")
      .join(p.as("b"), col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(stringFlagged.nonEmpty, "testdata has no shared passages?")
    val hashFlagged = rows.filter(_.getAs[Long]("n_shared") > 0)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(hashFlagged == stringFlagged)
  }

  test("text_oov_rate: vocab tokens cover total minus OOV, bounds hold") {
    val oov = operators.Corpus.textOovRate(spark, sf)
    val rows = oov.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_oov_distinct") <= r.getAs[Long]("n_oov"))
      val f = r.getAs[Double]("oov_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
    // corpus-level conservation: sum(n_tokens - n_oov) == total
    // occurrences of the top-30 vocabulary tokens
    val toks = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val vocabCover = toks.groupBy("tok").count()
      .orderBy(desc("count"), col("tok")).limit(30)
      .agg(sum("count")).head.getLong(0)
    val inVocab = rows.map(r =>
      r.getAs[Long]("n_tokens") - r.getAs[Long]("n_oov")).sum
    assert(inVocab == vocabCover)
  }

  test("corpus_token_budget: kept docs are exactly the within-cap prefix") {
    val kept = operators.Corpus.corpusTokenBudget(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept.nonEmpty)
    val nSources = Tables(spark, sf, "documents")
      .select("source").distinct().count()
    val cap = 10000L / nSources
    // independent reconstruction: running token sum per source in
    // doc_id order, keep while the doc ENDS within the cap
    val docs = Tables(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(_._2).flatMap { case (_, id, n) =>
        cum += n
        if (cum <= cap) Some((src, id)) else None
      }
    }.toSet
    assert(kept == expect)
  }

  test("mix_domains: kept sets are balanced near the smallest source") {
    val docs = Tables(spark, sf, "documents")
    val minCount = docs.groupBy("source").count()
      .agg(min("count")).head.getLong(0)
    val kept = operators.Corpus.mixDomains(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.nonEmpty)
    kept.foreach { case (src, n) =>
      // deterministic binomial draw around minCount: allow 4-sigma slack
      val sigma = math.sqrt(minCount.toDouble)
      assert(math.abs(n - minCount) <= 4 * sigma + 1,
        s"$src kept $n vs target $minCount")
    }
    // the smallest source keeps (almost) everything: p_keep = 1
    val smallest = docs.groupBy("source").count()
      .orderBy("count").head.getString(0)
    val orig = docs.where(col("source") === smallest).count()
    assert(kept(smallest) == orig)
  }
}
