package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the similarity-search ops that the hash
  * oracle can't express — bucket-coresidence of every emitted edge and
  * ranking integrity of the k-NN graph (#71).
  */
class SimilaritySpec extends GraftSpec {

  test("ann_knn_graph: edges are bucket-coresident, ranked, symmetricable") {
    graft.functions.Hashes.register(spark)
    val g = operators.Similarity.annKnnGraph(spark, sf)
    val edges = g.collect()
    assert(edges.nonEmpty, "knn graph is empty at test scale")
    // ranking integrity: per vec, ranks are 1..n with non-increasing
    // cosine (ties broken by nbr_id, so strictly sorted tuples)
    edges.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq ==
        (1L to ordered.length).toSeq)
      val cosines = ordered.map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse)
      assert(ordered.length <= 3)
    }
    // every edge joins two vectors in the SAME 6-bit rhp bucket
    val buckets = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), expr("md5_rhp_bucket(embedding, 6)").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    edges.foreach { r =>
      assert(buckets(r.getLong(0)) == buckets(r.getLong(2)),
        s"edge crosses buckets: $r")
    }
    // and within a bucket, the top-1 neighbor really is the max-cosine
    // bucket-mate: cross-check one vector against brute force
    val someVec = edges.head.getLong(0)
    val mates = buckets.filter(_._2 == buckets(someVec)).keySet - someVec
    val bf = operators.Similarity.annBruteforceFrom(
      Tables(spark, sf, "embeddings"),
      Tables(spark, sf, "embeddings").where(col("vec_id") === someVec)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      k = buckets.size)
      .where(col("c_id").isin(mates.toSeq: _*))
      .orderBy("rank") // rank was computed on RAW cosine — no 4dp ties
      .head
    val top1 = edges.filter(r => r.getLong(0) == someVec &&
      r.getLong(1) == 1L).head
    assert(top1.getLong(2) == bf.getLong(2))
  }

  test("multi-probe widens the candidate pool: top-1 never worse than LSH") {
    val lsh = operators.Similarity.annLsh(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getDouble(3)).max }
    val mp = operators.Similarity.annMultiprobe(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getDouble(3)).max }
    assert(mp.nonEmpty)
    // every query the single-bucket path answers is also answered, at
    // least as well, by the probe set (superset of candidates)
    lsh.foreach { case (q, best) =>
      assert(mp.contains(q), s"query $q lost by multiprobe")
      assert(mp(q) >= best - 1e-9, s"query $q top-1 degraded")
    }
  }

  test("ann_sq8: quantized cosine tracks exact cosine, ranks contiguous") {
    val rows = operators.Similarity.annSq8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.sortBy(_.getLong(1)).map(_.getLong(1)).toSeq ==
        (1L to rs.length).toSeq)
    }
    // SQ8 against the per-dim corpus range keeps the cosine error far
    // below the spread of this corpus's similarities
    rows.foreach { r =>
      val (q, e) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(q - e) < 0.05, s"quantization error too large: $r")
      assert(e <= 1.0001 && e >= -1.0001)
    }
  }
}
