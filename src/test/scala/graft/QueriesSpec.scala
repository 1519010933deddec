package graft

/** Behavioral smoke for every registered operator: runs at sf0.001,
  * returns rows (verified: even the pair-finding queries are non-empty
  * at this scale), and is stable across two runs (determinism — the
  * driver hash-compares, so any nondeterminism is a correctness bug).
  */
class QueriesSpec extends GraftSpec {

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry smoke query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name runs, is deterministic, and returns rows") {
      val rows1 = fn(spark, sf).collect().toSeq
      assert(rows1.nonEmpty, s"$name returned 0 rows")
      val rows2 = fn(spark, sf).collect().toSeq
      assert(rows1 == rows2, s"$name is nondeterministic across runs")
    }
}
