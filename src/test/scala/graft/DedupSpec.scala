package graft

import org.apache.spark.sql.functions._

/** Correctness properties of the near-dup pipeline that the rows-only
  * driver oracle can't see: MinHash-LSH precision (every reported pair
  * truly exceeds the Jaccard threshold) and recall (vs brute-force
  * ground truth over all pairs — feasible at sf0.001's corpus size).
  */
class DedupSpec extends GraftSpec {

  private def groundTruth(threshold: Double) = {
    val g = Tables(spark, sf, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh", expr(
        """array_distinct(transform(sequence(1, size(toks) - 2),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1),
          |    ' ', element_at(toks, i + 2))))""".stripMargin))
      .select("doc_id", "sh")
    g.as("a").join(g.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("""size(array_intersect(a.sh, b.sh)) /
                cast(size(a.sh) + size(b.sh) - size(array_intersect(a.sh, b.sh))
                  as double)""").as("j"))
      .where(col("j") >= threshold)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash-lsh pairs all verify >= 0.8 trigram jaccard (precision)") {
    val pairs = operators.Dedup.dedupMinhashLsh(spark, sf).collect()
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.8))
  }

  test("minhash-lsh finds the brute-force >= 0.9 pairs (recall)") {
    val truth = groundTruth(0.9)
    val found = operators.Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4x4 banding catches a j=0.9 pair w.p. ~.986; at this corpus size
    // the planted dups are j~1.0, so demand full recall.
    assert(truth.subsetOf(found),
      s"missed pairs: ${truth.diff(found).mkString(", ")}")
  }

  test("ngram-jaccard blocking agrees with brute force at >= 0.8") {
    val truth = groundTruth(0.8) // trigram truth only sanity-bounds size
    val found = operators.Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // bigram >= .8 pairs must at least cover the trigram >= .9 planted dups
    assert(groundTruth(0.9).subsetOf(found))
    assert(found.size >= truth.size)
  }

  test("exact dedup groups partition the corpus") {
    val total = Tables(spark, sf, "documents").count()
    val groups = operators.Dedup.dedupExact(spark, sf)
      .agg(sum("n_dups")).head.getLong(0)
    assert(groups == total)
  }

  test("minhash band geometry is a parameter: 4x4 and 8x2 verified pairs agree") {
    // Both candidate sets cover every jaccard >= 0.8 pair on this corpus
    // (8x2 has strictly higher catch probability at the threshold), and
    // the exact-Jaccard verify is shared — so outputs must be equal.
    val b44 = operators.Dedup.dedupMinhashLsh(spark, sf, 16, 4)
      .collect().map(_.toSeq).toSet
    val b82 = operators.Dedup.dedupMinhashLsh(spark, sf, 16, 2)
      .collect().map(_.toSeq).toSet
    assert(b44 == b82)
    assert(b44.nonEmpty)
  }

  test("simhash banding is a parameter: 4 and 8 bands agree at hamming<=3") {
    // Both cover hamming<=3 by pigeonhole (bands > maxHamming), and both
    // verify the exact XOR-popcount — so the OUTPUTS must be identical;
    // only the candidate volume differs.
    val b4 = operators.Dedup.dedupSimhash(spark, sf, bands = 4, maxHamming = 3)
      .collect().map(_.toSeq).toSet
    val b8 = operators.Dedup.dedupSimhash(spark, sf, bands = 8, maxHamming = 3)
      .collect().map(_.toSeq).toSet
    assert(b4 == b8)
    assert(b4.nonEmpty)
  }

  test("simhash banding rejects an insufficient pigeonhole cover") {
    intercept[IllegalArgumentException] {
      operators.Dedup.dedupSimhash(spark, sf, bands = 2, maxHamming = 3)
    }
  }

  test("embedding dedup pairs all verify >= 0.3 exact cosine (precision)") {
    val pairs = operators.Dedup.dedupEmbedding(spark, sf).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("cosine") >= 0.3))
  }

  test("embedding dedup candidates come from LSH buckets, not all pairs") {
    // a single band over a plane PREFIX nests: agreeing on planes 0..7
    // implies agreeing on planes 0..3, so the 8-bit verified pairs are a
    // strict subset of the 4-bit ones — the bits dial trades recall for
    // bucket occupancy exactly as documented
    val coarse = operators.Dedup.dedupEmbedding(spark, sf, bands = 1, bits = 4)
      .collect().map(_.toSeq).toSet
    val fine = operators.Dedup.dedupEmbedding(spark, sf, bands = 1, bits = 8)
      .collect().map(_.toSeq).toSet
    assert(fine.subsetOf(coarse))
    assert(fine.size < coarse.size)
  }

  test("embedding dedup auto-sizing floors at the eval geometry on " +
      "small corpora") {
    // n at this sf is under the target occupancy, so the computed bits
    // floor to 6 and the auto variant IS the fixed 4x6 eval query —
    // the dial only turns once n outgrows a band's bucket space
    val auto = operators.Dedup.dedupEmbeddingAuto(spark, sf)
      .collect().map(_.toSeq).toSet
    val fixed = operators.Dedup.dedupEmbedding(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(auto == fixed)
  }

  test("containment pairs: threshold holds, contained side is smaller") {
    val rows = operators.Dedup.dedupContainment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.9)
      assert(r.getLong(3) == r.getLong(0) || r.getLong(3) == r.getLong(1))
    }
    // containment >= jaccard always, so every verified >= 0.9 jaccard
    // pair that shares a passage must also appear here
    val jac = operators.Dedup.dedupNgramJaccard(spark, sf).collect()
      .filter(_.getDouble(2) >= 0.9).map(r => (r.getLong(0), r.getLong(1)))
    val cont = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = jac.filterNot(cont)
    assert(missing.isEmpty,
      s"jaccard>=0.9 pairs absent from containment: ${missing.take(5).toSeq}")
  }

  test("dedup_allpairs_exact: the prefix-filtered join equals the full " +
      "brute force over shingle sets — candidate completeness proven " +
      "against an implementation-independent recomputation") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val ws = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (ws.length < 3) Set.empty[String]
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val brute = (for {
      (a, sa) <- sh
      (b, sb) <- sh
      if a < b
      i = (sa & sb).size
      if i > 0 && 8 * i >= 3 * (sa.size + sb.size)
    } yield (a, b) -> ((i.toLong, (sa.size + sb.size - i).toLong))).toMap
    val out = operators.Dedup.dedupAllpairsExact(spark, sf).collect()
    assert(brute.nonEmpty, "no >=0.6 pairs at sf0.001 - vacuous test")
    assert(out.length == brute.size,
      s"pair sets differ: spark=${out.length} brute=${brute.size} - " +
        "the prefix filter dropped (or fabricated) a pair")
    out.foreach { r =>
      val k = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(brute.contains(k), s"pair $k not in brute force")
      val (i, u) = brute(k)
      assert(r.getAs[Long]("inter") == i && r.getAs[Long]("uni") == u,
        s"intersection/union mismatch for $k")
      val j = math.floor(i.toDouble / u.toDouble * 10000.0 + 0.5) / 10000.0
      assert(r.getAs[Double]("jaccard") == j)
    }
  }

  test("dedup_token_impact: removed docs are exactly the non-root #41 " +
      "cluster members, per-source doc/token mass reconciles against " +
      "raw documents, and removal is non-vacuous at this sf") {
    import org.apache.spark.sql.functions._
    val imp = operators.Extensions.dedupTokenImpact(spark, sf).collect()
    assert(imp.nonEmpty)
    val removedIds = operators.Extensions.dedupCluster(spark, sf)
      .collect()
      .filter(r => r.getAs[Long]("doc_id") != r.getAs[Long]("cluster_root"))
      .map(_.getAs[Long]("doc_id")).toSet
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
    val bySrc = docs.groupBy(_.getString(1))
    def tok(r: org.apache.spark.sql.Row): Long =
      r.getString(2).split(" ", -1).length.toLong
    imp.foreach { r =>
      val s0 = r.getAs[String]("source")
      val ds = bySrc(s0)
      val rm = ds.filter(d => removedIds(d.getLong(0)))
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("n_removed") == rm.length.toLong)
      assert(r.getAs[Long]("tokens_total") == ds.map(tok).sum)
      assert(r.getAs[Long]("tokens_removed") == rm.map(tok).sum)
    }
    assert(imp.map(_.getAs[Long]("n_removed")).sum == removedIds.size)
    assert(removedIds.nonEmpty, "no cluster removals - vacuous at this sf")
  }
}
