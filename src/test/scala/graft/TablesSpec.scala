package graft

/** Schema contract for the driver-generated tables: every loader returns
  * the expected columns, and the nanos-timestamp workaround holds.
  */
class TablesSpec extends GraftSpec {

  val expectedCols: Map[String, Set[String]] = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  for ((name, cols) <- expectedCols)
    test(s"$name has expected columns") {
      assert(cols.subsetOf(Tables(spark, sf, name).columns.toSet))
    }

  test("all tables load and are non-empty") {
    for (n <- Tables.names)
      assert(Tables(spark, sf, n).count() > 0, s"table $n is empty")
  }

  test("eventsUs exposes micro-precision ts and drops raw nanos") {
    val ev = Tables.eventsUs(spark, sf)
    assert(ev.columns.contains("ts_us"))
    assert(!ev.columns.contains("ts"))
    val Array(min, max) = ev.selectExpr("min(ts_us)", "max(ts_us)")
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    // sane epoch-microsecond range (2020..2030)
    assert(min > 1577836800000000L && max < 1893456000000000L)
  }

  test("embeddings are fixed 64-dim vectors") {
    import org.apache.spark.sql.functions._
    val dims = Tables(spark, sf, "embeddings")
      .select(size(col("embedding")).as("d")).distinct().collect()
    assert(dims.map(_.getInt(0)).toSeq == Seq(64))
  }
}
