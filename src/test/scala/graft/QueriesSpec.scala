package graft

/** Behavioral smoke for every registered operator: runs at sf0.001,
  * schema is non-empty and stable across two runs (determinism — the
  * driver hash-compares, so any nondeterminism is a correctness bug).
  *
  * Pair-finding queries may legitimately return 0 rows at this tiny
  * scale; everything else must produce rows.
  */
class QueriesSpec extends GraftSpec {

  private val mayBeEmpty = Set(
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_embedding", "join_anti", "join_range", "ann_lsh")

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry smoke query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name runs, is deterministic${
        if (mayBeEmpty(name)) "" else ", and returns rows"}") {
      val r1 = fn(spark, sf)
      val rows1 = r1.collect().toSeq
      if (!mayBeEmpty(name)) assert(rows1.nonEmpty, s"$name returned 0 rows")
      val rows2 = fn(spark, sf).collect().toSeq
      assert(rows1 == rows2, s"$name is nondeterministic across runs")
    }
}
