package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Graph}

/** Contract tests for the analytics extensions (SURVEY.md §2
  * #131-135): link prediction on pencil-and-paper graphs, and
  * invariant sweeps for readability / diversity / Gini / interval
  * merge on the sf0.001 tables.
  */
class AnalyticsSpec extends GraftSpec {

  test("link prediction: path graph P4 scores its two open wedges") {
    val sp = spark
    import sp.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("pa", "pb")
    val rows = Graph.linkPredictionFrom(und).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("common_neighbors"),
          r.getAs[Double]("resource_alloc"),
          r.getAs[Double]("jaccard"))).toMap
    assert(rows.keySet == Set((1L, 3L), (2L, 4L)))
    // (1,3) share node 2 (deg 2): RA = 1/2; jaccard = 1/(1+2-1) = 0.5
    assert(rows((1L, 3L)) == ((1L, 0.5, 0.5)))
    assert(rows((2L, 4L)) == ((1L, 0.5, 0.5)))
  }

  test("link prediction: star leaves pair through the center") {
    val sp = spark
    import sp.implicits._
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("pa", "pb")
    val rows = Graph.linkPredictionFrom(und).collect()
    assert(rows.length == 3) // the three leaf pairs
    rows.foreach { r =>
      assert(r.getAs[Long]("common_neighbors") == 1L)
      // center degree 3: RA = 1/3 → 0.3333 under r4
      assert(r.getAs[Double]("resource_alloc") == 0.3333)
      // leaf neighbor sets are both {center}: jaccard 1
      assert(r.getAs[Double]("jaccard") == 1.0)
    }
  }

  test("link prediction: K4 has no non-adjacent pairs") {
    val sp = spark
    import sp.implicits._
    val und = (for { a <- 1 to 4; b <- 1 to 4 if a < b }
      yield (a.toLong, b.toLong)).toDF("pa", "pb")
    assert(Graph.linkPredictionFrom(und).count() == 0L)
  }

  test("readability: per-row formula matches a driver-side recompute") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Analytics.textReadability(spark, sf).collect()
    assert(out.length == docs.size)
    out.take(25).foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val words = math.max(text.split(" ", -1).length, 1)
      val sentences = math.max("[.!?]".r.findAllIn(text).length, 1)
      val syllables =
        "[aeiouy]+".r.findAllIn(text.toLowerCase).length
      assert(r.getAs[Int]("n_words") == words)
      assert(r.getAs[Int]("n_sentences") == sentences)
      assert(r.getAs[Int]("n_syllables") == syllables)
      val fk = 0.39 * (words.toDouble / sentences) +
        11.8 * (syllables.toDouble / words) - 15.59
      assert(math.abs(r.getAs[Double]("fk_grade") - fk) < 5e-5)
    }
  }

  test("diversity: Simpson in [0,1), effective types in [1, n_types]") {
    val rows = Analytics.eventsDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val simpson = r.getAs[Double]("simpson")
      val eff = r.getAs[Double]("effective_types")
      val nTypes = r.getAs[Long]("n_types")
      assert(simpson >= 0.0 && simpson < 1.0)
      assert(eff >= 1.0 - 5e-5 && eff <= nTypes + 5e-5)
    }
    // single-type users must score exactly 0 (all mass on one type)
    rows.filter(_.getAs[Long]("n_types") == 1L).foreach { r =>
      assert(r.getAs[Double]("simpson") == 0.0)
      assert(r.getAs[Double]("effective_types") == 1.0)
    }
  }

  test("gini: one row, bounded in [0,1), zero for equal masses") {
    val sp = spark
    import sp.implicits._
    val r = Analytics.ordersGini(spark, sf).collect()
    assert(r.length == 1)
    val g = r.head.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
  }

  test("split: every doc in exactly one split, ratios near 80/10/10") {
    val docs = Tables(spark, sf, "documents").count()
    val rows = operators.Corpus.splitTrainVal(spark, sf).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit.values.sum == docs) // partition: no doc lost or doubled
    val train = bySplit.getOrElse("train", 0L).toDouble / docs
    val valr = bySplit.getOrElse("val", 0L).toDouble / docs
    assert(math.abs(train - 0.8) < 0.06, s"train ratio $train")
    assert(math.abs(valr - 0.1) < 0.04, s"val ratio $valr")
  }

  test("domain drift: chi2 non-negative, one row per source") {
    val nSources = Tables(spark, sf, "documents")
      .select("source").distinct().count()
    val rows = operators.Corpus.corpusDomainDrift(spark, sf).collect()
    assert(rows.length == nSources)
    rows.foreach(r => assert(r.getAs[Double]("chi2") >= 0.0))
  }

  test("bpe pairs: 2-char pairs in descending corpus-weighted order") {
    val rows = operators.Corpus.textBpePairs(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[String]("pair").length == 2))
    val counts = rows.map(_.getAs[Long]("n_occurrences"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("dispersion: coherence bounded, centroid norm in [0,1]") {
    val rows = operators.Similarity.embedDispersion(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_vectors")
      val mpc = r.getAs[Double]("mean_pairwise_cos")
      val cn = r.getAs[Double]("centroid_norm")
      // mean pairwise cosine of ANY unit set lives in [-1/(n-1), 1]
      assert(mpc >= -1.0 / (n - 1) - 5e-5 && mpc <= 1.0 + 5e-5)
      assert(cn >= 0.0 && cn <= 1.0 + 5e-5)
    }
  }

  test("phash: every planted re-upload pairs with its original at 0") {
    val planted = Tables(spark, sf, "documents")
      .where(col("doc_id") % 7 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val pairs = operators.Multimodal.mmPhashDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming")))
    val found = pairs.collect {
      case (a, b, h) if b == a + 1000000L && h == 0L => a
    }.toSet
    assert(planted.subsetOf(found),
      s"missing re-uploads: ${(planted -- found).take(5)}")
  }

  test("intervals: merged coverage bounded by count x length") {
    val rows = Analytics.intervalsMerge(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_intervals")
      val segs = r.getAs[Long]("n_segments")
      val days = r.getAs[Long]("covered_days")
      assert(segs >= 1L && segs <= n)
      // every segment covers >= one interval length; union <= sum
      assert(days >= 30L * segs || segs == 0L)
      assert(days <= 30L * n)
    }
  }
}
