package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Exprs.{r4, r4Sql}

/** Round-19 widening (SURVEY.md §2 #322+): the sample-emitting face
  * of the sketch family — bottom-k deterministic group samples
  * (`functions.SampleSketch`, the 7th mergeable sketch) with an
  * estimate-vs-exact eval, the per-group exemplar read every curation
  * UI and debugging session runs against a 100 TB table.
  */
object Forge {

  private val centsExpr = "cast(floor(value * 100.0 + 0.5) as bigint)"
  private val centsSql = "CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)"
  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)

  // --------------------------------------------------------------- #322
  /** #322 mergeable bottom-k group samples + estimate-vs-exact eval:
    * every event type carries a k=32 deterministic uniform sample of
    * its purchase-value cents (rows with the 32 smallest md5 hashes of
    * their event id — the KMV lattice emitting SAMPLE ROWS instead of
    * a cardinality, `functions.SampleSketch`), evaluated against the
    * exact group mean. The sample is a pure set function of the data —
    * any partition layout, merge tree, or replay yields the identical
    * exemplar set (spec-pinned), which is what makes it usable as
    * merge-on-read state in the streamed twin.
    *
    * Exactness: sample membership is proven by the integer
    * sample_sum_cents (the oracle re-derives the same 32 rows by
    * `ROW_NUMBER() OVER (ORDER BY hash, id)`); means and the relative
    * error are r4'd IEEE over exact integers, with the zero-mean
    * denominator gated to null on both engines.
    *
    * Scale: ONE grouped aggregation; partial state is ≤ 24·k bytes per
    * group and combines map-side — only sketches cross the shuffle
    * (the reason a reservoir with random draws is the wrong tool: not
    * mergeable, not replayable, not oracle-checkable).
    */
  def sampleBottomk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SampleSketch.register(spark)
    val e = Tables.eventsUs(spark, dir)
      .select(col("event_type"), col("event_id"),
        expr(centsExpr).as("c"))
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(event_id as string)), 1, 15), " +
          "16, 10) as long)"))
    e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(dec)).as("sc"),
        expr("bottomk_sample(h, event_id, c, 32)").as("sample"))
      .select(col("event_type"), col("n"),
        size(col("sample")).cast("long").as("sample_n"),
        expr("aggregate(sample, 0L, (a, x) -> a + x)")
          .as("sample_sum_cents"),
        col("sc"))
      .select(col("event_type"), col("n"), col("sample_n"),
        col("sample_sum_cents"),
        r4(col("sc").cast("double") / col("n") / 100.0)
          .as("exact_mean_dollars"),
        r4(col("sample_sum_cents").cast("double") / col("sample_n")
          / 100.0).as("sample_mean_dollars"),
        when(col("sc") =!= 0L,
          r4(abs(col("sample_sum_cents").cast("double") / col("sample_n")
            - col("sc").cast("double") / col("n"))
            / abs(col("sc").cast("double") / col("n")))).as("rel_err"))
      .orderBy("event_type")
  }

  val sampleBottomkSql: String =
    s"""WITH e AS (
       |  SELECT event_type, event_id, $centsSql AS c,
       |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
       |      ::UBIGINT AS h
       |  FROM events),
       |rk AS (
       |  SELECT event_type, c, ROW_NUMBER() OVER (
       |    PARTITION BY event_type ORDER BY h, event_id) AS rn
       |  FROM e),
       |samp AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sample_n,
       |    CAST(SUM(c) AS BIGINT) AS sample_sum_cents
       |  FROM rk WHERE rn <= 32 GROUP BY 1),
       |ex AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(c::HUGEINT) AS sc
       |  FROM e GROUP BY 1)
       |SELECT ex.event_type, ex.n, samp.sample_n, samp.sample_sum_cents,
       |  ${r4Sql("CAST(ex.sc AS DOUBLE) / ex.n / 100.0")}
       |    AS exact_mean_dollars,
       |  ${r4Sql("CAST(samp.sample_sum_cents AS DOUBLE) " +
                  "/ samp.sample_n / 100.0")} AS sample_mean_dollars,
       |  CASE WHEN ex.sc <> 0 THEN
       |    ${r4Sql("ABS(CAST(samp.sample_sum_cents AS DOUBLE) " +
                    "/ samp.sample_n - CAST(ex.sc AS DOUBLE) / ex.n) " +
                    "/ ABS(CAST(ex.sc AS DOUBLE) / ex.n)")} END AS rel_err
       |FROM ex JOIN samp ON ex.event_type = samp.event_type
       |ORDER BY ex.event_type""".stripMargin

  // --------------------------------------------------------------- #324
  /** Bit-interleave two 6-bit values (`a` into odd bit positions, `b`
    * into even) as a SQL expression string — the Morton/Z-value the
    * #108/#324 layouts cluster by. `shr` abstracts the engines' shift
    * syntax (Spark `shiftright(x, i)`, DuckDB `x >> i`).
    */
  private def zInterleave(a: String, b: String,
      shr: (String, Int) => String): String =
    (0 until 6).map { i =>
      s"((${shr(a, i)} & 1) * ${1L << (2 * i + 1)} + " +
        s"(${shr(b, i)} & 1) * ${1L << (2 * i)})"
    }.mkString("(", " + ", ")")

  /** #324 Z-ORDER skipping audit with REAL footers — the measured
    * argument for multi-dimension clustering (#108 computes z-values;
    * this PROVES what they buy): physically write the same orders
    * projection under TWO layouts — date-clustered (the #320 layout:
    * month directories, day-sorted) and Z-ORDERED (Morton-interleaved
    * 6-bit day-quantile × 6-bit customer-bucket, top-6-bits
    * directories, z-sorted) — then read the ACTUAL parquet footer
    * min/max of BOTH dimensions off every file and measure what a
    * day-range probe, a customer-bucket probe, and the combined probe
    * each skip. The date layout skips on day and reads ~everything
    * for the customer probe; z-order skips on BOTH (each file spans
    * ~1/64 of either dimension's range) — the reason warehouse
    * OPTIMIZE orders multi-predicate tables by z-value instead of a
    * single sort key, here with real bytes instead of a slide.
    *
    * Deterministic == oracle-checkable (the #320 argument, twice):
    * both writes hash-route one directory to one task, sort totally
    * within it, and roll files at exactly 512 records, so file f of a
    * directory holds sorted-rank rows [512f, 512f+511] and the DuckDB
    * oracle recomputes every file's per-dimension min/max from the
    * rank-cut closed form. Day quantization uses FIXED literal bounds
    * (not data-dependent min/max) so both engines derive identical
    * z-values.
    *
    * Scale: two partition-parallel writes (one shuffle each), footer
    * reads distributed and metadata-plane; the audit output is
    * 6 rows.
    */
  def layoutZorderFooter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fileRows = 512
    val shrSpark = (x: String, i: Int) => s"shiftright($x, $i)"
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("day"),
        (col("o_custkey") % 64).cast("long").as("cb"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .withColumn("db", expr(
        "least(63L, greatest(0L, (day - 8000) * 64 div 2000))"))
      .withColumn("z", expr(zInterleave("db", "cb", shrSpark)))
      .withColumn("zb", expr("z div 64"))
    val tmpD = java.nio.file.Files
      .createTempDirectory("graft_zorder_date").toString
    val tmpZ = java.nio.file.Files
      .createTempDirectory("graft_zorder_z").toString
    o.repartition(col("month"))
      .sortWithinPartitions("month", "day", "o_orderkey")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", fileRows.toLong)
      .partitionBy("month").parquet(tmpD)
    o.repartition(col("zb"))
      .sortWithinPartitions("zb", "z", "o_orderkey")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", fileRows.toLong)
      .partitionBy("zb").parquet(tmpZ)

    def fileStats(path: String, layout: String) =
      Apex.readFooterLongStats(spark, path, Seq("day", "cb"))
        .groupBy("path")
        .agg(min(when(col("stat_col") === "day", col("min_v")))
            .as("min_day"),
          max(when(col("stat_col") === "day", col("max_v")))
            .as("max_day"),
          min(when(col("stat_col") === "cb", col("min_v"))).as("min_cb"),
          max(when(col("stat_col") === "cb", col("max_v"))).as("max_cb"))
        .withColumn("layout", lit(layout))
    val stats = fileStats(tmpD, "date_clustered")
      .unionByName(fileStats(tmpZ, "zorder"))
    // probes: day range only, customer bucket only, combined.
    // Sentinel bounds make "no constraint" explicit per dimension.
    val probes = Seq(
      ("day_1995-03", 9190L, 9220L, 0L, 63L),
      ("cust_bucket_7", 0L, 1000000L, 7L, 7L),
      ("combined", 9190L, 9220L, 7L, 7L))
      .toDF("probe", "d_lo", "d_hi", "c_lo", "c_hi")
    stats.crossJoin(broadcast(probes))
      .groupBy("layout", "probe")
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("max_day") >= col("d_lo") &&
          col("min_day") <= col("d_hi") &&
          col("max_cb") >= col("c_lo") &&
          col("min_cb") <= col("c_hi"), 1L).otherwise(0L)).as("n_read"))
      .select(col("layout"), col("probe"), col("n_files"), col("n_read"),
        r4(lit(1.0) - col("n_read").cast("double") / col("n_files"))
          .as("skip_frac"))
      .orderBy("layout", "probe")
  }

  val layoutZorderFooterSql: String = {
    val shrDuck = (x: String, i: Int) => s"($x >> $i)"
    s"""WITH o AS (
       |  SELECT o_orderkey,
       |    CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
       |      AS BIGINT) AS day,
       |    CAST(o_custkey % 64 AS BIGINT) AS cb,
       |    strftime(o_orderdate, '%Y-%m') AS month
       |  FROM orders),
       |z AS (
       |  SELECT *,
       |    least(63, greatest(0, (day - 8000) * 64 // 2000)) AS db
       |  FROM o),
       |zz AS (
       |  SELECT *, ${zInterleave("db", "cb", shrDuck)} AS zv FROM z),
       |zb AS (SELECT *, zv // 64 AS zbk FROM zz),
       |rd AS (
       |  SELECT month, day, cb,
       |    CAST((ROW_NUMBER() OVER (PARTITION BY month
       |      ORDER BY day, o_orderkey) - 1) // 512 AS BIGINT) AS fid
       |  FROM zb),
       |rz AS (
       |  SELECT zbk, day, cb,
       |    CAST((ROW_NUMBER() OVER (PARTITION BY zbk
       |      ORDER BY zv, o_orderkey) - 1) // 512 AS BIGINT) AS fid
       |  FROM zb),
       |f AS (
       |  SELECT 'date_clustered' AS layout, month AS part, fid,
       |    MIN(day) AS min_day, MAX(day) AS max_day,
       |    MIN(cb) AS min_cb, MAX(cb) AS max_cb
       |  FROM rd GROUP BY 2, 3
       |  UNION ALL
       |  SELECT 'zorder', CAST(zbk AS VARCHAR), fid,
       |    MIN(day), MAX(day), MIN(cb), MAX(cb)
       |  FROM rz GROUP BY 2, 3),
       |p AS (SELECT * FROM (VALUES
       |  ('day_1995-03', 9190, 9220, 0, 63),
       |  ('cust_bucket_7', 0, 1000000, 7, 7),
       |  ('combined', 9190, 9220, 7, 7))
       |  AS t(probe, d_lo, d_hi, c_lo, c_hi))
       |SELECT layout, probe, CAST(COUNT(*) AS BIGINT) AS n_files,
       |  CAST(COUNT(*) FILTER (WHERE max_day >= d_lo AND min_day <= d_hi
       |    AND max_cb >= c_lo AND min_cb <= c_hi) AS BIGINT) AS n_read,
       |  ${r4Sql("1.0 - CAST(COUNT(*) FILTER (WHERE max_day >= d_lo " +
                  "AND min_day <= d_hi AND max_cb >= c_lo " +
                  "AND min_cb <= c_hi) AS DOUBLE) / COUNT(*)")}
       |    AS skip_frac
       |FROM f CROSS JOIN p
       |GROUP BY layout, probe ORDER BY layout, probe""".stripMargin
  }

  // ----------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_bottomk" -> (sampleBottomk _),
    "layout_zorder_footer" -> (layoutZorderFooter _))

  val oracles: Map[String, String] = Map(
    "sample_bottomk" -> sampleBottomkSql,
    "layout_zorder_footer" -> layoutZorderFooterSql)
}
