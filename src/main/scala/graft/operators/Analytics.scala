package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.Exprs.{r4, r4Sql, sumDec, sumDecSql}

/** Corpus/catalog analytics extensions (SURVEY.md §2 #131-134):
  * readability scoring, concentration/diversity indices, and interval
  * coverage — each a single declarative plan with exact-arithmetic
  * discipline (integer counters and decimal sums everywhere; IEEE
  * division only in the final projection under r4).
  */
object Analytics {

  // --------------------------------------------------------------- #131
  /** #131 Flesch-Kincaid readability per document: words, sentences,
    * vowel-group syllable proxy, FK grade + reading ease. Pure
    * single-scan narrow projection (regexp counts — no explode, no
    * shuffle except the final sort); all three ratio inputs are
    * integers, so the grade is engine-exact under r4. The standard
    * text-quality signal next to #35/#64 for corpus filtering.
    */
  def textReadability(spark: SparkSession, dir: String): DataFrame = {
    val words = greatest(size(split(col("text"), " ")), lit(1))
    val sentences = greatest(
      size(expr("regexp_extract_all(text, '[.!?]', 0)")), lit(1))
    val syllables =
      size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        words.as("n_words"), sentences.as("n_sentences"),
        syllables.as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        // int/int divides first (double in BOTH engines), THEN the
        // literal multiplies — DuckDB parses bare 0.39 as DECIMAL, so
        // literal*int would take its decimal arithmetic path
        r4(lit(0.39) * (col("n_words") / col("n_sentences")) +
          lit(11.8) * (col("n_syllables") / col("n_words")) - lit(15.59))
          .as("fk_grade"),
        r4(lit(206.835) -
          lit(1.015) * (col("n_words") / col("n_sentences")) -
          lit(84.6) * (col("n_syllables") / col("n_words")))
          .as("reading_ease"))
      .orderBy("doc_id")
  }

  val textReadabilitySql: String = {
    val words = "GREATEST(len(string_split(text, ' ')), 1)"
    val sentences = "GREATEST(len(regexp_extract_all(text, '[.!?]')), 1)"
    val syllables = "len(regexp_extract_all(lower(text), '[aeiouy]+'))"
    s"""WITH t AS (
       |  SELECT doc_id, $words AS n_words, $sentences AS n_sentences,
       |    $syllables AS n_syllables
       |  FROM documents)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  ${r4Sql("0.39 * (n_words / n_sentences) + " +
                  "11.8 * (n_syllables / n_words) - 15.59")} AS fk_grade,
       |  ${r4Sql("206.835 - 1.015 * (n_words / n_sentences) - " +
                  "84.6 * (n_syllables / n_words)")} AS reading_ease
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- #132
  /** #132 Simpson diversity of each user's event mix: 1 - Σp² plus the
    * effective type count 1/Σp². Σc² and N are integers off one keyed
    * agg (the per-(user,type) counts are partial-aggregable map-side),
    * so both indices are exact rationals under single IEEE divisions.
    * The catalog reading: how concentrated is each job's event
    * history — the state-machine health check next to #103's Markov
    * matrix.
    */
  def eventsDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sumsq"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        r4(lit(1.0) - col("sumsq") /
          (col("n_events") * col("n_events")).cast("double"))
          .as("simpson"),
        r4((col("n_events") * col("n_events")) / col("sumsq").cast("double"))
          .as("effective_types"))
      .orderBy("user_id")

  val eventsDiversitySql: String =
    s"""WITH c AS (
       |  SELECT user_id, event_type, COUNT(*) AS c
       |  FROM events GROUP BY 1, 2),
       |s AS (
       |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
       |    COUNT(*) AS n_types, CAST(SUM(c * c) AS BIGINT) AS sumsq
       |  FROM c GROUP BY 1)
       |SELECT user_id, n_events, n_types,
       |  ${r4Sql("1.0 - sumsq / CAST(n_events * n_events AS DOUBLE)")}
       |    AS simpson,
       |  ${r4Sql("(n_events * n_events) / CAST(sumsq AS DOUBLE)")}
       |    AS effective_types
       |FROM s ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------- #133
  /** #133 Gini coefficient of customer revenue concentration —
    * G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over revenue sorted
    * ascending. Per-customer revenue and both weighted sums are exact
    * decimals (rank × decimal products — no floating accumulation);
    * the ranking sort is total via the (revenue, custkey) tie-break.
    * The single global window IS the algorithm (a Gini needs a full
    * sort); at 100 TB use the #110 ABC machinery's range-partitioned
    * sort — the formula stays one pass either way. Complements #110's
    * Pareto bands with the scalar inequality measure.
    */
  def ordersGini(spark: SparkSession, dir: String): DataFrame = {
    // per-customer revenue re-clamped to DECIMAL(18,2) after the sum so
    // the rank×revenue product stays inside DECIMAL(38) on BOTH engines
    // (DuckDB's SUM widens to DECIMAL(38,2), whose product would spill)
    val rev = Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast(DecimalType(18, 2)).as("rev"))
    val w = Window.orderBy("rev", "o_custkey")
    val ranked = rev.withColumn("i", row_number().over(w))
    ranked.agg(
        count(lit(1)).as("n_customers"),
        sum(col("rev")).cast("double").as("total_revenue"),
        sum(col("i").cast(DecimalType(18, 0)) * col("rev"))
          .cast("double").as("wsum"))
      .select(col("n_customers"), col("total_revenue"),
        r4((lit(2.0) * col("wsum") -
            (col("n_customers") + lit(1)) * col("total_revenue")) /
          (col("n_customers") * col("total_revenue"))).as("gini"))
  }

  val ordersGiniSql: String =
    s"""WITH rev AS (
       |  SELECT o_custkey,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
       |      AS rev
       |  FROM orders GROUP BY 1),
       |ranked AS (
       |  SELECT rev, o_custkey,
       |    ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i
       |  FROM rev),
       |agg AS (
       |  SELECT COUNT(*) AS n_customers,
       |    CAST(SUM(rev) AS DOUBLE) AS total_revenue,
       |    CAST(SUM(CAST(i AS DECIMAL(18,0)) * rev) AS DOUBLE) AS wsum
       |  FROM ranked)
       |SELECT n_customers, total_revenue,
       |  ${r4Sql("(2.0 * wsum - (n_customers + 1) * total_revenue) / " +
                  "(n_customers * total_revenue)")} AS gini
       |FROM agg""".stripMargin

  // --------------------------------------------------------------- #134
  /** #134 interval merge (coverage union): each order opens a 30-day
    * service interval; overlapping-or-touching intervals per customer
    * merge into segments via the sweep: a row starts a new segment iff
    * its start exceeds the running max end of all earlier intervals
    * (two stacked windows over ONE per-customer Exchange — the
    * standard O(n log n) union, no self-join). Pure integer date
    * arithmetic. The catalog reading: collapse per-job file-activity
    * windows into contiguous busy periods (reference jobs emit events
    * over archive windows — reactor.py:183-218).
    */
  def intervalsMerge(spark: SparkSession, dir: String,
      lengthDays: Int = 30): DataFrame = {
    val iv = Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("start"),
        date_add(to_date(col("o_orderdate")), lengthDays).as("end"))
    val wPrev = Window.partitionBy("o_custkey")
      .orderBy("start", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("o_custkey")
      .orderBy("start", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv.withColumn("prev_end", max(col("end")).over(wPrev))
      .withColumn("new_seg",
        when(col("prev_end").isNull || col("start") > col("prev_end"), 1)
          .otherwise(0))
      .withColumn("seg", sum(col("new_seg")).over(wRun))
      .groupBy("o_custkey", "seg")
      .agg(min(col("start")).as("seg_start"), max(col("end")).as("seg_end"),
        count(lit(1)).as("n_orders"))
      .groupBy("o_custkey")
      .agg(sum(col("n_orders")).as("n_intervals"),
        count(lit(1)).as("n_segments"),
        sum(datediff(col("seg_end"), col("seg_start"))).as("covered_days"))
      .orderBy("o_custkey")
  }

  val intervalsMergeSql: String =
    """WITH iv AS (
      |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS s,
      |    CAST(o_orderdate AS DATE) + 30 AS e
      |  FROM orders),
      |marked AS (
      |  SELECT o_custkey, s, e,
      |    CASE WHEN MAX(e) OVER (PARTITION BY o_custkey
      |        ORDER BY s, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s > MAX(e) OVER (PARTITION BY o_custkey
      |        ORDER BY s, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |    THEN 1 ELSE 0 END AS new_seg, o_orderkey
      |  FROM iv),
      |seg AS (
      |  SELECT o_custkey, s, e,
      |    SUM(new_seg) OVER (PARTITION BY o_custkey ORDER BY s, o_orderkey
      |      ROWS UNBOUNDED PRECEDING) AS seg
      |  FROM marked),
      |merged AS (
      |  SELECT o_custkey, seg, MIN(s) AS seg_start, MAX(e) AS seg_end,
      |    COUNT(*) AS n_orders
      |  FROM seg GROUP BY 1, 2)
      |SELECT o_custkey, CAST(SUM(n_orders) AS BIGINT) AS n_intervals,
      |  COUNT(*) AS n_segments,
      |  CAST(SUM(date_diff('day', seg_start, seg_end)) AS BIGINT)
      |    AS covered_days
      |FROM merged GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_readability" -> (textReadability _),
    "events_diversity" -> (eventsDiversity _),
    "orders_gini" -> (ordersGini _),
    "intervals_merge" ->
      ((s: SparkSession, d: String) => intervalsMerge(s, d)))

  val oracles: Map[String, String] = Map(
    "text_readability" -> textReadabilitySql,
    "events_diversity" -> eventsDiversitySql,
    "orders_gini" -> ordersGiniSql,
    "intervals_merge" -> intervalsMergeSql)
}
