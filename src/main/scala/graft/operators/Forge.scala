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

  // ----------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_bottomk" -> (sampleBottomk _))

  val oracles: Map[String, String] = Map(
    "sample_bottomk" -> sampleBottomkSql)
}
