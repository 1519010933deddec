package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Exprs.{r4, r4Sql, sumDec, sumDecSql}

/** Round-18 widening (SURVEY.md §2 #314-316): the pre-release audit
  * reads a corpus custodian runs before shipping data — k-anonymity
  * (#314: which quasi-identifier cells are small enough to
  * re-identify someone) and l-diversity (#315: which cells are
  * k-large but sensitive-homogeneous, the attack k-anonymity alone
  * misses) — plus Neyman optimal allocation (#316: the
  * design-optimal stratified sampling the #44/#182 samplers
  * approximate with proportional shares).
  *
  * Cross-engine exactness: k/l are pure integer counts over integer-
  * or string-bucketed quasi-identifiers (the balance band is one IEEE
  * floor both engines compute identically); Neyman's σ_h comes from
  * exact DECIMAL moments with the allocation as r4'd IEEE over them.
  */
object Aegis {

  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Quasi-identifier projection shared by #314/#315: nation ×
    * segment × coarse balance band — the classic "harmless
    * demographics" combination that turns identifying in small cells.
    */
  private def qi(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .select(col("c_custkey"),
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 5000.0).cast("long").as("bal_band"))

  private val qiSql: String =
    """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
      |    c_mktsegment AS segment,
      |    CAST(FLOOR(c_acctbal / 5000.0) AS BIGINT) AS bal_band
      |  FROM customer""".stripMargin

  // --------------------------------------------------------------- #314
  /** #314 k-anonymity audit (k=5): every quasi-identifier cell with
    * its population and the at-risk flag — a record in a cell smaller
    * than k is re-identifiable by anyone who knows those three
    * "harmless" attributes. The cell table is DOMAIN-sized (nations ×
    * segments × bands), so the whole audit is one grouped shuffle;
    * at any corpus scale the output stays bounded while the risky
    * tail thins (bigger data is safer data, and the audit shows it).
    */
  def privacyKAnonymity(spark: SparkSession, dir: String): DataFrame =
    qi(spark, dir)
      .groupBy("nation", "segment", "bal_band")
      .agg(count(lit(1)).as("n"))
      .select(col("nation"), col("segment"), col("bal_band"), col("n"),
        (col("n") < 5L).as("at_risk"))
      .orderBy("nation", "segment", "bal_band")

  val privacyKAnonymitySql: String =
    s"""WITH q AS (
       |  $qiSql)
       |SELECT nation, segment, bal_band,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  COUNT(*) < 5 AS at_risk
       |FROM q GROUP BY 1, 2, 3
       |ORDER BY nation, segment, bal_band""".stripMargin

  // --------------------------------------------------------------- #315
  /** #315 l-diversity audit (l=2) over the same cells: a cell can be
    * k-large yet reveal everyone's sensitive value if all members
    * share it — the homogeneity attack k-anonymity misses. Sensitive
    * attribute: the priority of each customer's FIRST order (earliest
    * date, lowest key on ties — deterministic on both engines);
    * customers with no orders carry no sensitive value and don't
    * count toward diversity. Emits per cell the member count, the
    * count with a sensitive value, distinct sensitive values l, and
    * the homogeneous flag (l < 2 among ≥ 2 carriers).
    *
    * Scale: first-order pick is one key-partitioned window over
    * orders; the cell rollup is the #314 domain-sized shuffle.
    */
  def privacyLDiversity(spark: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val firstOrder = Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
      .withColumn("rn", row_number().over(wo))
      .where(col("rn") === 1)
      .select(col("o_custkey").as("c_custkey"),
        col("o_orderpriority").as("sensitive"))
    qi(spark, dir)
      .join(firstOrder, Seq("c_custkey"), "left")
      .groupBy("nation", "segment", "bal_band")
      .agg(count(lit(1)).as("n"),
        sum(when(col("sensitive").isNotNull, 1L).otherwise(0L))
          .as("n_sensitive"),
        countDistinct(col("sensitive")).as("l_distinct"))
      .select(col("nation"), col("segment"), col("bal_band"), col("n"),
        col("n_sensitive"), col("l_distinct"),
        (col("n_sensitive") >= 2L && col("l_distinct") < 2L)
          .as("homogeneous"))
      .orderBy("nation", "segment", "bal_band")
  }

  val privacyLDiversitySql: String =
    s"""WITH q AS (
       |  $qiSql),
       |fo AS (
       |  SELECT o_custkey AS c_custkey, o_orderpriority AS sensitive
       |  FROM (
       |    SELECT o_custkey, o_orderpriority, ROW_NUMBER() OVER (
       |      PARTITION BY o_custkey
       |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
       |    FROM orders)
       |  WHERE rn = 1)
       |SELECT nation, segment, bal_band,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(COUNT(sensitive) AS BIGINT) AS n_sensitive,
       |  CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_distinct,
       |  COUNT(sensitive) >= 2 AND COUNT(DISTINCT sensitive) < 2
       |    AS homogeneous
       |FROM q LEFT JOIN fo USING (c_custkey)
       |GROUP BY 1, 2, 3
       |ORDER BY nation, segment, bal_band""".stripMargin

  // --------------------------------------------------------------- #316
  /** #316 Neyman optimal allocation across event-type strata for a
    * 10,000-row sample budget: n_h ∝ N_h·σ_h minimizes the variance
    * of the stratified mean — the design-optimal upgrade of the
    * proportional allocation the #44 stratified sampler uses. σ_h
    * comes from exact DECIMAL moments; shares and allocations are
    * r4'd IEEE over them, with the proportional share alongside so
    * the read shows exactly where optimal ≠ proportional (high-
    * variance strata get oversampled).
    */
  def sampleNeyman(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.eventsUs(spark, dir)
      .select(col("event_type"),
        expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(dec)).as("s"),
        sum((col("c") * col("c")).cast(dec)).as("q"))
    // n=1 strata have undefined sigma (Spark NaN vs DuckDB NULL on
    // the zero division) — gate to null explicitly; null nh_sigma
    // drops out of the sumDec denominator on both engines, and
    // all-degenerate inputs (den = 0) null the shares the same way
    val sigma = when(col("n") > 1L, sqrt(
      (col("n").cast(dec) * col("q") - col("s") * col("s")).cast("double") /
        (col("n").cast(dec) * (col("n") - 1)).cast("double")))
    val weighted = m.select(col("event_type"), col("n"),
      sigma.as("sigma"), (col("n").cast("double") * sigma).as("nh_sigma"))
    val tot = weighted.agg(
      sumDec(col("nh_sigma"), 38, 6).as("den"),
      sum("n").as("n_total"))
    weighted.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n"),
        r4(col("sigma") / lit(100.0)).as("sigma_dollars"),
        when(col("den") > 0.0,
          r4(col("nh_sigma") / col("den"))).as("neyman_share"),
        r4(col("n").cast("double") / col("n_total").cast("double"))
          .as("proportional_share"),
        when(col("den") > 0.0,
          r4(lit(10000.0) * col("nh_sigma") / col("den"))).as("alloc_n"))
      .orderBy("event_type")
  }

  val sampleNeymanSql: String =
    s"""WITH m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM((CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))::HUGEINT)
       |      AS s,
       |    SUM((CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))::HUGEINT
       |      * (CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))) AS q
       |  FROM events GROUP BY 1),
       |w AS (
       |  SELECT event_type, n,
       |    CASE WHEN n > 1 THEN
       |      SQRT(CAST(n::HUGEINT * q - s * s AS DOUBLE)
       |        / CAST(n::HUGEINT * (n - 1) AS DOUBLE)) END AS sigma,
       |    CASE WHEN n > 1 THEN CAST(n AS DOUBLE)
       |      * SQRT(CAST(n::HUGEINT * q - s * s AS DOUBLE)
       |        / CAST(n::HUGEINT * (n - 1) AS DOUBLE)) END AS nh_sigma
       |  FROM m),
       |t AS (SELECT ${sumDecSql("nh_sigma", 38, 6)} AS den,
       |             CAST(SUM(n) AS BIGINT) AS n_total FROM w)
       |SELECT event_type, n,
       |  ${r4Sql("sigma / 100.0")} AS sigma_dollars,
       |  CASE WHEN den > 0 THEN ${r4Sql("nh_sigma / den")}
       |    END AS neyman_share,
       |  ${r4Sql("CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)")}
       |    AS proportional_share,
       |  CASE WHEN den > 0 THEN ${r4Sql("10000.0 * nh_sigma / den")}
       |    END AS alloc_n
       |FROM w, t ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "privacy_k_anonymity" -> (privacyKAnonymity _),
    "privacy_l_diversity" -> (privacyLDiversity _),
    "sample_neyman" -> (sampleNeyman _))

  val oracles: Map[String, String] = Map(
    "privacy_k_anonymity" -> privacyKAnonymitySql,
    "privacy_l_diversity" -> privacyLDiversitySql,
    "sample_neyman" -> sampleNeymanSql)
}
