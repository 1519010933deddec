package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Exprs.{r4, r4Sql, sumDec, sumDecSql}

/** Round-16 widening (SURVEY.md §2 #300-306): the inferential-stats
  * kit an experimentation/curation pipeline runs beside the point
  * estimates it already has — two-sample Kolmogorov-Smirnov (#300,
  * distribution shift), Mann-Whitney U (#301, the rank test behind
  * "did the metric move", robust to outliers), Welch's t over every
  * type pair (#302), Cramér's V off a χ² independence test (#303,
  * type × weekday association), a Benford first-digit screen (#304,
  * the classic fabricated-data audit), maximum drawdown (#305, the
  * peak-to-trough risk read), and a Sobel gradient-energy profile
  * through the REAL image codec (#306 — the fourth pixels-true leg:
  * blur/texture screening for image curation).
  *
  * Cross-engine exactness: every aggregation clears to integer or
  * DECIMAL space (cents, cumulative counts, 2×-scaled ranks, tie
  * terms, gradient sums); doubles appear only in FINAL expressions
  * over those exact integers (r4'd), or in literals both engines
  * parse to the same bits. Where a significance label is emitted it
  * is decided either in integer space or by comparing two doubles
  * both engines compute from identical exact inputs through the
  * identical IEEE expression tree — never by comparing independently
  * accumulated floats.
  */
object Keystone {

  /** Exact integer cents of the event value (engine-identical: one
    * IEEE multiply + floor; value*100 lands within 1e-10 of the
    * integer, so +0.5/floor can't straddle).
    */
  private val centsExpr = "cast(floor(value * 100.0 + 0.5) as bigint)"
  private val centsSql = "CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)"

  // --------------------------------------------------------------- #300
  /** #300 two-sample Kolmogorov-Smirnov: click vs purchase value
    * distributions. D = max_v |F₁(v) − F₂(v)| computed ENTIRELY in
    * integer space: D_num(v) = |c₁(v)·n₂ − c₂(v)·n₁| over the merged
    * distinct-cents axis, D = max D_num / (n₁·n₂). The α=0.05
    * verdict is the integer inequality D_num²·10⁶ > 1844164·(n₁+n₂)·
    * n₁·n₂ (1.358² = 1.844164 — the two-sided KS critical constant),
    * carried in DECIMAL(38,0) so it can't float apart (the #295
    * device). The argmax cents (lowest on ties) locates WHERE the
    * distributions diverge most.
    *
    * Scale: one grouped shuffle to the per-cents counts, then windows
    * over the DISTINCT-CENTS axis — a bounded VALUE DOMAIN (~56k
    * cents values at any sf; the #114/#270 value-domain-window
    * discipline), never the event table. Totals attach by broadcast.
    */
  def statsKsTest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsUs(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), expr(centsExpr).as("c"))
    val g = e.groupBy("c")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("a"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("b"))
    val wv = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("ca", sum("a").over(wv))
      .withColumn("cb", sum("b").over(wv))
    val tot = cum.agg(max("ca").as("n1"), max("cb").as("n2"))
    val dnum = cum.crossJoin(broadcast(tot))
      .select(col("c"), col("n1"), col("n2"),
        abs(col("ca") * col("n2") - col("cb") * col("n1")).as("d_num"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // one-sided-sample guard: n1·n2 = 0 would be Spark NaN vs DuckDB
    // NULL on the double division — gate both sides explicitly
    dnum.orderBy(desc("d_num"), col("c")).limit(1)
      .select(col("n1"), col("n2"), col("d_num"),
        col("c").as("argmax_cents"),
        when(col("n1") > 0L && col("n2") > 0L,
          r4(col("d_num").cast("double") /
            (col("n1") * col("n2")).cast("double"))).as("d_stat"),
        when(col("n1") > 0L && col("n2") > 0L,
          col("d_num").cast(dec) * col("d_num") * lit(1000000L) >
            lit(1844164L).cast(dec) * (col("n1") + col("n2")) *
              col("n1") * col("n2")).as("reject_05"))
  }

  val statsKsTestSql: String =
    s"""WITH e AS (
       |  SELECT event_type, $centsSql AS c FROM events
       |  WHERE event_type IN ('click', 'purchase')),
       |g AS (
       |  SELECT c,
       |    CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
       |      AS a,
       |    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
       |      AS b
       |  FROM e GROUP BY 1),
       |cum AS (
       |  SELECT c,
       |    SUM(a) OVER (ORDER BY c) AS ca,
       |    SUM(b) OVER (ORDER BY c) AS cb
       |  FROM g),
       |tot AS (SELECT CAST(MAX(ca) AS BIGINT) AS n1,
       |               CAST(MAX(cb) AS BIGINT) AS n2 FROM cum),
       |dn AS (
       |  SELECT c, n1, n2,
       |    CAST(ABS(ca * n2 - cb * n1) AS BIGINT) AS d_num
       |  FROM cum, tot)
       |SELECT n1, n2, d_num, c AS argmax_cents,
       |  CASE WHEN n1 > 0 AND n2 > 0 THEN
       |    ${r4Sql("CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)")}
       |  END AS d_stat,
       |  CASE WHEN n1 > 0 AND n2 > 0 THEN
       |    d_num::HUGEINT * d_num * 1000000 >
       |      1844164::HUGEINT * (n1 + n2) * n1 * n2
       |  END AS reject_05
       |FROM dn ORDER BY d_num DESC, c LIMIT 1""".stripMargin

  // --------------------------------------------------------------- #301
  /** #301 Mann-Whitney U: view vs signup values. The 2×-integral
    * tie-averaged rank of a row is a pure function of its VALUE
    * (2·cum≤ − t + 1, the #296 device), so the rank sum R₁·2 =
    * Σ_v a(v)·r2(v) needs only the per-cents count table — the fact
    * table is never rank-windowed. U₁·2 = R₁·2 − n₁(n₁+1); the
    * normal approximation uses the exact tie-corrected variance
    * Var(U) = n₁n₂(n(n²−1) − Σ(t³−t))/(12n(n−1)) kept as an integer
    * numerator/denominator pair in DECIMAL(38,0); z applies the
    * continuity correction in 2× space (∓1 = ∓0.5 in U units).
    *
    * The α=0.05 label compares zc²·10⁴·dn against 153664·vn — both
    * sides computed as ONE IEEE product chain over the same exact
    * integers on both engines (identical expression tree → identical
    * doubles → identical compare; a DECIMAL carry would overflow 38
    * digits at the 100× probe's worst case, measured-not-guessed
    * trade documented here).
    */
  def statsMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsUs(spark, dir)
      .where(col("event_type").isin("view", "signup"))
      .select(col("event_type"), expr(centsExpr).as("c"))
    val g = e.groupBy("c")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("a"),
        count(lit(1)).as("t"))
    val wv = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = g.withColumn("cum", sum("t").over(wv))
      .select(col("a"), col("t"),
        (col("cum") * 2L - col("t") + 1L).as("r2"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val agg = ranked.agg(
      sum(col("a")).as("n1"),
      sum(col("t") - col("a")).as("n2"),
      sum((col("a") * col("r2")).cast(dec)).as("r1_2x"),
      sum((col("t") * col("t") * col("t") - col("t")).cast(dec))
        .as("tie3"))
    val n = col("n1") + col("n2")
    val u12x = col("r1_2x") - (col("n1").cast(dec) * (col("n1") + 1L))
    val zc = u12x - col("n1").cast(dec) * col("n2")
    val zcc = zc - when(zc > 0, 1).when(zc < 0, -1).otherwise(0).cast(dec)
    val vn = col("n1").cast(dec) * col("n2") *
      (n.cast(dec) * (n.cast(dec) * n - 1) - col("tie3"))
    val dn = n.cast(dec) * (n - 1) * 12L
    // all-tied guard: vn = 0 (every value identical) would be Spark
    // NaN (0/0) vs DuckDB NULL — gate both sides explicitly
    agg.select(col("n1"), col("n2"),
      col("r1_2x").cast("long").as("r1_2x"),
      u12x.cast("long").as("u1_2x"),
      when(vn > 0,
        r4((zcc.cast("double") / 2.0) /
          sqrt(vn.cast("double") / dn.cast("double")))).as("z"),
      when(vn > 0,
        zcc.cast("double") * zcc.cast("double") * 10000.0 *
          dn.cast("double") >
          lit(153664.0) * vn.cast("double")).as("reject_05"))
  }

  val statsMannWhitneySql: String =
    s"""WITH e AS (
       |  SELECT event_type, $centsSql AS c FROM events
       |  WHERE event_type IN ('view', 'signup')),
       |g AS (
       |  SELECT c,
       |    CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
       |      AS a,
       |    CAST(COUNT(*) AS BIGINT) AS t
       |  FROM e GROUP BY 1),
       |rk AS (
       |  SELECT a, t, SUM(t) OVER (ORDER BY c) * 2 - t + 1 AS r2
       |  FROM g),
       |m AS (
       |  SELECT CAST(SUM(a) AS BIGINT) AS n1,
       |    CAST(SUM(t - a) AS BIGINT) AS n2,
       |    SUM(a::HUGEINT * r2) AS r1_2x,
       |    SUM(t::HUGEINT * t * t - t) AS tie3
       |  FROM rk),
       |d AS (
       |  SELECT n1, n2, r1_2x,
       |    r1_2x - n1::HUGEINT * (n1 + 1) AS u1_2x,
       |    r1_2x - n1::HUGEINT * (n1 + 1) - n1::HUGEINT * n2 AS zc,
       |    n1::HUGEINT * n2 *
       |      ((n1 + n2)::HUGEINT * ((n1 + n2)::HUGEINT * (n1 + n2) - 1)
       |        - tie3) AS vn,
       |    (n1 + n2)::HUGEINT * (n1 + n2 - 1) * 12 AS dn
       |  FROM m),
       |d2 AS (
       |  SELECT n1, n2, r1_2x, u1_2x, vn, dn,
       |    zc - CASE WHEN zc > 0 THEN 1 WHEN zc < 0 THEN -1 ELSE 0 END
       |      AS zcc
       |  FROM d)
       |SELECT n1, n2, CAST(r1_2x AS BIGINT) AS r1_2x,
       |  CAST(u1_2x AS BIGINT) AS u1_2x,
       |  CASE WHEN vn > 0 THEN
       |    ${r4Sql("(CAST(zcc AS DOUBLE) / 2.0) / " +
                    "SQRT(CAST(vn AS DOUBLE) / CAST(dn AS DOUBLE))")}
       |  END AS z,
       |  CASE WHEN vn > 0 THEN
       |    CAST(zcc AS DOUBLE) * CAST(zcc AS DOUBLE) * 10000.0 *
       |      CAST(dn AS DOUBLE) > 153664.0 * CAST(vn AS DOUBLE)
       |  END AS reject_05
       |FROM d2""".stripMargin

  // --------------------------------------------------------------- #302
  /** #302 Welch's t over every unordered event-type pair (10 rows):
    * the unequal-variance two-sample t and its Welch-Satterthwaite
    * degrees of freedom. One scan reduces each type to exact DECIMAL
    * moments (n, Σc, Σc²); the 5×5 pair frame is a broadcast
    * self-join of that 5-row table. t and df are single IEEE
    * expression trees over the exact moments, r4'd — means and
    * sample variances never accumulate in float.
    */
  def statsWelchT(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = Tables.eventsUs(spark, dir)
      .select(col("event_type"), expr(centsExpr).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(dec)).as("s"),
        sum((col("c") * col("c")).cast(dec)).as("q"))
    def se2(p: String): org.apache.spark.sql.Column = {
      // v/n = (n·Q − S²) / (n²(n−1)) as one IEEE division of exact ints
      val n = col(s"$p.n")
      val nd = n.cast(dec)
      (nd * col(s"$p.q") - col(s"$p.s") * col(s"$p.s")).cast("double") /
        (nd * n * (n - 1)).cast("double")
    }
    val a = se2("a")
    val b = se2("b")
    val meanDiff = col("a.s").cast("double") / col("a.n").cast("double") -
      col("b.s").cast("double") / col("b.n").cast("double")
    // degenerate guard: n ≤ 1 (variance undefined) or zero pooled
    // variance would be Spark NaN/Inf vs DuckDB NULL — gate both
    // sides to null explicitly
    val ok = col("a.n") > 1L && col("b.n") > 1L && (a + b) > 0.0
    broadcast(m.as("a")).join(broadcast(m.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        col("a.n").as("n1"), col("b.n").as("n2"),
        r4(meanDiff / lit(100.0)).as("mean_diff"),
        when(ok, r4(meanDiff / sqrt(a + b))).as("t_stat"),
        when(ok, r4((a + b) * (a + b) /
          (a * a / (col("a.n") - 1).cast("double") +
            b * b / (col("b.n") - 1).cast("double")))).as("df"))
      .orderBy("type_a", "type_b")
  }

  val statsWelchTSql: String =
    s"""WITH m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(($centsSql)::HUGEINT) AS s,
       |    SUM(($centsSql)::HUGEINT * ($centsSql)) AS q
       |  FROM events GROUP BY 1),
       |p AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    a.n AS n1, b.n AS n2,
       |    CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
       |      - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS md,
       |    CAST(a.n::HUGEINT * a.q - a.s * a.s AS DOUBLE) /
       |      CAST(a.n::HUGEINT * a.n * (a.n - 1) AS DOUBLE) AS sa,
       |    CAST(b.n::HUGEINT * b.q - b.s * b.s AS DOUBLE) /
       |      CAST(b.n::HUGEINT * b.n * (b.n - 1) AS DOUBLE) AS sb
       |  FROM m a JOIN m b ON a.event_type < b.event_type)
       |SELECT type_a, type_b, n1, n2,
       |  ${r4Sql("md / 100.0")} AS mean_diff,
       |  CASE WHEN n1 > 1 AND n2 > 1 AND sa + sb > 0 THEN
       |    ${r4Sql("md / SQRT(sa + sb)")}
       |  END AS t_stat,
       |  CASE WHEN n1 > 1 AND n2 > 1 AND sa + sb > 0 THEN
       |    ${r4Sql("(sa + sb) * (sa + sb) / " +
                    "(sa * sa / CAST(n1 - 1 AS DOUBLE) + " +
                    "sb * sb / CAST(n2 - 1 AS DOUBLE))")}
       |  END AS df
       |FROM p ORDER BY type_a, type_b""".stripMargin

  // --------------------------------------------------------------- #303
  /** #303 χ² independence of event type × weekday + Cramér's V. The
    * weekday comes from pure integer epoch-day arithmetic ((d+4)%7,
    * 1970-01-01 = Thursday → 0 = Sunday) so both engines bucket
    * identically — never from engine date functions whose week
    * conventions differ. Each of the 35 cells contributes
    * (o·N − r·c)²/(r·c·N) as ONE IEEE expression over exact integer
    * counts; the 35 terms cross the final sum through sumDec (exact,
    * order-free). V = √(χ²/(N·min(r−1,c−1))).
    *
    * Scale: one grouped shuffle to the 35-cell table; margins attach
    * by broadcast. The verdict compares χ² (a double both engines
    * built identically) against the literal 36.415 (df=24, α=0.05).
    */
  def statsCramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.eventsUs(spark, dir)
      .select(col("event_type"),
        expr("(ts_us div 86400000000 + 4) % 7").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy("event_type").agg(sum("o").as("r"))
    val colT = cells.groupBy("dow").agg(sum("o").as("cl"))
    val nT = cells.agg(sum("o").as("nn"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val term = ((col("o").cast(dec) * col("nn") -
      col("r").cast(dec) * col("cl")).cast("double") *
      (col("o").cast(dec) * col("nn") -
        col("r").cast(dec) * col("cl")).cast("double")) /
      (col("r").cast(dec) * col("cl") * col("nn")).cast("double")
    cells
      .join(broadcast(rowT), "event_type")
      .join(broadcast(colT), "dow")
      .crossJoin(broadcast(nT))
      .agg(max("nn").as("n"), sumDec(term, 38, 8).as("chi2"))
      .select(col("n"), r4(col("chi2")).as("chi2"),
        r4(sqrt(col("chi2") / (col("n") * 4L).cast("double")))
          .as("cramers_v"),
        lit(24L).as("df"),
        (col("chi2") > 36.415).as("reject_05"))
  }

  val statsCramersVSql: String =
    s"""WITH cells AS (
       |  SELECT event_type, (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
       |    CAST(COUNT(*) AS BIGINT) AS o
       |  FROM events GROUP BY 1, 2),
       |rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r
       |       FROM cells GROUP BY 1),
       |ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS cl
       |       FROM cells GROUP BY 1),
       |nt AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM cells),
       |t AS (
       |  SELECT nn,
       |    CAST(o::HUGEINT * nn - r::HUGEINT * cl AS DOUBLE) *
       |      CAST(o::HUGEINT * nn - r::HUGEINT * cl AS DOUBLE) /
       |      CAST(r::HUGEINT * cl * nn AS DOUBLE) AS term
       |  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow), nt),
       |s AS (
       |  SELECT MAX(nn) AS n, ${sumDecSql("term", 38, 8)} AS chi2 FROM t)
       |SELECT n, ${r4Sql("chi2")} AS chi2,
       |  ${r4Sql("SQRT(chi2 / CAST(n * 4 AS DOUBLE))")} AS cramers_v,
       |  CAST(24 AS BIGINT) AS df, chi2 > 36.415 AS reject_05
       |FROM s""".stripMargin

  // --------------------------------------------------------------- #304
  /** #304 Benford first-digit screen over positive event cents — the
    * classic fabricated-data audit: natural multi-scale positive
    * quantities follow P(d) = log₁₀(1 + 1/d); a flat or spiky digit
    * profile flags synthetic or capped data. The first digit comes
    * from the INTEGER's string head (engine-identical — never from
    * float log₁₀ of the value); the nine log₁₀ constants are JVM-
    * computed doubles embedded as round-trip literals both engines
    * parse to the same bits. χ² = Σ (o − n·p)²/(n·p) crosses the sum
    * through sumDec; per-digit shares are r4'd ratios of exact ints.
    */
  def statsBenford(spark: SparkSession, dir: String): DataFrame = {
    val p = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
    val pCol = p.tail.foldLeft(
      when(col("digit") === 1, lit(p.head._2))) { case (acc, (d, v)) =>
      acc.when(col("digit") === d, lit(v))
    }.otherwise(lit(0.0))
    val digits = Tables.eventsUs(spark, dir)
      .select(expr(centsExpr).as("c"))
      .where(col("c") > 0L)
      .select(substring(col("c").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum("n_obs").as("n"))
    val withP = digits.crossJoin(broadcast(tot)).withColumn("p", pCol)
    val chi = withP
      .agg(sumDec((col("n_obs").cast("double") -
          col("n").cast("double") * col("p")) *
        (col("n_obs").cast("double") - col("n").cast("double") * col("p")) /
        (col("n").cast("double") * col("p")), 38, 8).as("chi2"))
    withP.crossJoin(broadcast(chi))
      .select(col("digit"), col("n_obs"),
        r4(col("n_obs").cast("double") / col("n").cast("double"))
          .as("obs_share"),
        r4(col("p")).as("benford_share"),
        r4(col("n_obs").cast("double") /
          (col("n").cast("double") * col("p"))).as("excess_ratio"),
        r4(col("chi2")).as("chi2"))
      .orderBy("digit")
  }

  val statsBenfordSql: String = {
    // E0 suffix is load-bearing: a plain decimal literal parses as
    // DECIMAL in DuckDB and its decimal->double conversion is a
    // division, not a correctly-rounded string parse (the #293 device)
    val pvals = (1 to 9).map { d =>
      val v = math.log10(1.0 + 1.0 / d).toString
      s"($d, ${if (v.contains("E")) v else v + "E0"})"
    }.mkString(", ")
    s"""WITH p(digit, p) AS (VALUES $pvals),
       |dg AS (
       |  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       |    CAST(COUNT(*) AS BIGINT) AS n_obs
       |  FROM (SELECT $centsSql AS c FROM events) WHERE c > 0
       |  GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM dg),
       |wp AS (
       |  SELECT digit, n_obs, n, p.p AS p
       |  FROM dg JOIN p USING (digit), tot),
       |chi AS (
       |  SELECT ${sumDecSql(
              "(CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p) * " +
              "(CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p) / " +
              "(CAST(n AS DOUBLE) * p)", 38, 8)} AS chi2
       |  FROM wp)
       |SELECT digit, n_obs,
       |  ${r4Sql("CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)")}
       |    AS obs_share,
       |  ${r4Sql("p")} AS benford_share,
       |  ${r4Sql("CAST(n_obs AS DOUBLE) / (CAST(n AS DOUBLE) * p)")}
       |    AS excess_ratio,
       |  ${r4Sql("chi2")} AS chi2
       |FROM wp, chi ORDER BY digit""".stripMargin
  }

  // --------------------------------------------------------------- #305
  /** #305 maximum drawdown of the daily value series per event type:
    * running peak, deepest peak-to-trough drop, and the days it
    * happened — the risk read behind "how bad did this metric get
    * from its best". Trough = earliest day attaining the max
    * drawdown; peak = earliest day ≤ trough attaining the running
    * max in force at the trough. All in integer cents; dd_frac is
    * one r4'd division.
    *
    * Scale: the daily table is span-sized per type (the #288/#295
    * axis); its windows and the peak-locate join never touch the
    * event table after the first grouped shuffle.
    */
  def tsMaxDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val daily = Tables.persistSlot("keystone.drawdown.daily",
      Tables.eventsUs(spark, dir)
        .select(col("event_type"), expr(s"ts_us div $dayUs").as("d"),
          expr(centsExpr).as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("y")))
    val wp = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = daily.withColumn("peak", max("y").over(wp))
      .withColumn("dd", col("peak") - col("y"))
    val wt = Window.partitionBy("event_type")
      .orderBy(desc("dd"), col("d"))
    val trough = dd.withColumn("rn", row_number().over(wt))
      .where(col("rn") === 1)
      .select(col("event_type"), col("d").as("trough_day"),
        col("y").as("trough_cents"), col("peak").as("peak_cents"),
        col("dd").as("max_dd_cents"))
    val peakDay = trough.join(daily, Seq("event_type"))
      .where(col("d") <= col("trough_day") &&
        col("y") === col("peak_cents"))
      .groupBy("event_type", "trough_day", "trough_cents", "peak_cents",
        "max_dd_cents")
      .agg(min("d").as("peak_day"))
    // zero-peak guard (all-zero daily series): 0/0 is Spark NaN vs
    // DuckDB NULL — gate both sides explicitly
    peakDay.select(col("event_type"), col("peak_day"), col("trough_day"),
      col("peak_cents"), col("trough_cents"), col("max_dd_cents"),
      when(col("peak_cents") > 0L,
        r4(col("max_dd_cents").cast("double") /
          col("peak_cents").cast("double"))).as("dd_frac"))
      .orderBy("event_type")
  }

  val tsMaxDrawdownSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
       |    CAST(SUM($centsSql) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |dd AS (
       |  SELECT event_type, d, y,
       |    MAX(y) OVER (PARTITION BY event_type ORDER BY d) AS peak,
       |    MAX(y) OVER (PARTITION BY event_type ORDER BY d) - y AS dd
       |  FROM daily),
       |tr AS (
       |  SELECT event_type, d AS trough_day, y AS trough_cents,
       |    peak AS peak_cents, dd AS max_dd_cents
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
       |          ORDER BY dd DESC, d) AS rn FROM dd)
       |  WHERE rn = 1),
       |pk AS (
       |  SELECT tr.event_type, tr.trough_day, tr.trough_cents,
       |    tr.peak_cents, tr.max_dd_cents, MIN(daily.d) AS peak_day
       |  FROM tr JOIN daily ON tr.event_type = daily.event_type
       |    AND daily.d <= tr.trough_day AND daily.y = tr.peak_cents
       |  GROUP BY 1, 2, 3, 4, 5)
       |SELECT event_type, peak_day, trough_day, peak_cents, trough_cents,
       |  max_dd_cents,
       |  CASE WHEN peak_cents > 0 THEN
       |    ${r4Sql("CAST(max_dd_cents AS DOUBLE) / " +
                    "CAST(peak_cents AS DOUBLE)")}
       |  END AS dd_frac
       |FROM pk ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- #306
  /** #306 Sobel gradient-energy profile — the FOURTH real-codec leg
    * (after #285 resize, #290 phash, #298 histogram): decode the
    * planted BMP with ImageIO, run the 3×3 Sobel operator over the
    * TRUE interior pixels in exact integer arithmetic, and emit the
    * L1 gradient mass, edge-pixel count (|Gx|+|Gy| ≥ 512), and the
    * horizontal/vertical orientation split — the blur/texture screen
    * an image-curation cascade gates on (flat and noise-free images
    * score near zero). Oracle recomputes the closed-form pixel
    * function at all eight neighbors; a green hash proves the
    * decoded raster drives the kernel.
    *
    * Scale: map-side narrow per partition (the codec-leg shape);
    * per-doc work bounded by the 128×128 dimension cap; only the
    * 6-column summary leaves the partition.
    */
  def mmImageEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.spread(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
    ids.mapPartitions(_.map { id =>
      val img = Multimodal.decodeBmp(Multimodal.plantedBmp(id))
      val w = img.getWidth
      val h = img.getHeight
      val px = img.getRaster.getSamples(0, 0, w, h, 0,
        new Array[Int](w * h))
      @inline def v(x: Int, y: Int): Int = px(y * w + x)
      var gradSum = 0L
      var nEdge = 0L
      var nHoriz = 0L
      var nVert = 0L
      var y = 1
      while (y < h - 1) {
        var x = 1
        while (x < w - 1) {
          val gx = (v(x + 1, y - 1) + 2 * v(x + 1, y) + v(x + 1, y + 1)) -
            (v(x - 1, y - 1) + 2 * v(x - 1, y) + v(x - 1, y + 1))
          val gy = (v(x - 1, y + 1) + 2 * v(x, y + 1) + v(x + 1, y + 1)) -
            (v(x - 1, y - 1) + 2 * v(x, y - 1) + v(x + 1, y - 1))
          val ax = math.abs(gx)
          val ay = math.abs(gy)
          gradSum += ax + ay
          if (ax + ay >= 512) nEdge += 1
          if (ax > ay) nHoriz += 1 else if (ay > ax) nVert += 1
          x += 1
        }
        y += 1
      }
      (id, (w - 2).toLong * (h - 2), gradSum, nEdge, nHoriz, nVert)
    }).toDF("doc_id", "n_interior", "grad_l1_sum", "n_edge", "n_horiz",
      "n_vert")
      .orderBy("doc_id")
  }

  /** Oracle evaluates the closed-form pixel function
    * v = (3x+5y+id) mod 256 at the eight Sobel taps — never decodes
    * a byte (the #285/#290/#298 proof shape).
    */
  val mmImageEdgesSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id,
       |    16 * (1 + (doc_id * 7 + 3) % 8) AS w,
       |    16 * (1 + (doc_id * 5 + 1) % 8) AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, i % (w - 2) + 1 AS x, i // (w - 2) + 1 AS y
       |  FROM (SELECT doc_id, w, h,
       |          unnest(range(0, (w - 2) * (h - 2))) AS i
       |        FROM dims)),
       |g AS (
       |  SELECT doc_id, w, h,
       |    ((3 * (x + 1) + 5 * (y - 1) + doc_id) % 256
       |      + 2 * ((3 * (x + 1) + 5 * y + doc_id) % 256)
       |      + (3 * (x + 1) + 5 * (y + 1) + doc_id) % 256)
       |    - ((3 * (x - 1) + 5 * (y - 1) + doc_id) % 256
       |      + 2 * ((3 * (x - 1) + 5 * y + doc_id) % 256)
       |      + (3 * (x - 1) + 5 * (y + 1) + doc_id) % 256) AS gx,
       |    ((3 * (x - 1) + 5 * (y + 1) + doc_id) % 256
       |      + 2 * ((3 * x + 5 * (y + 1) + doc_id) % 256)
       |      + (3 * (x + 1) + 5 * (y + 1) + doc_id) % 256)
       |    - ((3 * (x - 1) + 5 * (y - 1) + doc_id) % 256
       |      + 2 * ((3 * x + 5 * (y - 1) + doc_id) % 256)
       |      + (3 * (x + 1) + 5 * (y - 1) + doc_id) % 256) AS gy
       |  FROM px)
       |SELECT doc_id,
       |  CAST(MAX((w - 2) * (h - 2)) AS BIGINT) AS n_interior,
       |  CAST(SUM(ABS(gx) + ABS(gy)) AS BIGINT) AS grad_l1_sum,
       |  CAST(COUNT(*) FILTER (WHERE ABS(gx) + ABS(gy) >= 512) AS BIGINT)
       |    AS n_edge,
       |  CAST(COUNT(*) FILTER (WHERE ABS(gx) > ABS(gy)) AS BIGINT)
       |    AS n_horiz,
       |  CAST(COUNT(*) FILTER (WHERE ABS(gy) > ABS(gx)) AS BIGINT)
       |    AS n_vert
       |FROM g GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- #352
  /** #352 mergeable higher-moment statistics — skewness and excess
    * kurtosis per event type PLUS the merged ALL row, computed from
    * ONE set of exact power sums (n, Σc, Σc², Σc³, Σc⁴ in
    * DECIMAL(38,0) — c⁴·n stays within 38 digits far past the 100×
    * replica): the profiler read that tells a distribution-shape
    * story (#15/#326 stop at mean/stddev; tail asymmetry and
    * heavy-tailedness are what decide winsorization and log-transform
    * choices). The ALL row is DERIVED BY SUMMING the per-type decimal
    * partials — not by re-scanning — which is the mergeability
    * demonstration: these five numbers are the complete
    * merge-associative state (the same lattice argument as the #53/
    * #293 sketches, here exact). Doubles appear only in the final
    * expression tree over exact decimals, with shared sub-values
    * (μ, Σc²/n, …) so both engines evaluate the identical IEEE tree;
    * m2^1.5 is written m2·√m2 (no pow); n < 2 or zero variance gates
    * every shape stat to null on both sides.
    *
    * Scale: one map-side-combinable grouped shuffle of five decimal
    * partials; the ALL fold is a 5-row aggregate.
    */
  def aggMomentsSkew(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = Tables.eventsUs(spark, dir)
      .select(col("event_type"), expr(centsExpr).as("c"))
    // powers in DECIMAL space: c⁴ wraps int64 already at c ≈ 55k
    // cents (this stream's top purchases) — the same overflow class
    // the #268 hardening caught in the Bollinger square-sum
    val cd = col("c").cast(dec)
    val per = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(cd).as("s1"),
        sum(cd * cd).as("s2"),
        sum(cd * cd * cd).as("s3"),
        sum(cd * cd * cd * cd).as("s4"))
    val all = per.agg(sum("n").as("n"), sum("s1").as("s1"),
        sum("s2").as("s2"), sum("s3").as("s3"), sum("s4").as("s4"))
      .select(lit("ALL").as("event_type"), col("n"), col("s1"),
        col("s2"), col("s3"), col("s4"))
    val u = per.unionByName(all)
      .withColumn("nd", col("n").cast("double"))
      .withColumn("mu", col("s1").cast("double") / col("nd"))
      .withColumn("r2", col("s2").cast("double") / col("nd"))
      .withColumn("r3", col("s3").cast("double") / col("nd"))
      .withColumn("r4m", col("s4").cast("double") / col("nd"))
      .withColumn("m2", col("r2") - col("mu") * col("mu"))
      .withColumn("m3", col("r3") - lit(3.0) * col("mu") * col("r2")
        + lit(2.0) * col("mu") * col("mu") * col("mu"))
      .withColumn("m4", col("r4m") - lit(4.0) * col("mu") * col("r3")
        + lit(6.0) * col("mu") * col("mu") * col("r2")
        - lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
    val ok = col("n") >= 2L && col("m2") > 0.0
    u.select(col("event_type"), col("n"),
        r4(col("mu") / 100.0).as("mean_dollars"),
        when(ok, r4(sqrt(col("m2")) / 100.0)).as("stddev_dollars"),
        when(ok, r4(col("m3") / (col("m2") * sqrt(col("m2")))))
          .as("skewness"),
        when(ok, r4(col("m4") / (col("m2") * col("m2")) - lit(3.0)))
          .as("kurtosis_excess"))
      .orderBy("event_type")
  }

  val aggMomentsSkewSql: String =
    s"""WITH e AS (SELECT event_type, $centsSql AS c FROM events),
       |per AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(c::HUGEINT) AS s1,
       |    SUM(c::HUGEINT * c) AS s2,
       |    SUM(c::HUGEINT * c * c) AS s3,
       |    SUM(c::HUGEINT * c * c * c) AS s4
       |  FROM e GROUP BY 1),
       |mrg AS (
       |  SELECT 'ALL' AS event_type, CAST(SUM(n) AS BIGINT) AS n,
       |    SUM(s1) AS s1, SUM(s2) AS s2, SUM(s3) AS s3, SUM(s4) AS s4
       |  FROM per),
       |u AS (SELECT * FROM per UNION ALL SELECT * FROM mrg),
       |d AS (
       |  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
       |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
       |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
       |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
       |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4m
       |  FROM u),
       |m AS (
       |  SELECT *, r2 - mu * mu AS m2,
       |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
       |    r4m - 4.0 * mu * r3 + 6.0 * mu * mu * r2
       |      - 3.0 * mu * mu * mu * mu AS m4
       |  FROM d)
       |SELECT event_type, n,
       |  ${r4Sql("mu / 100.0")} AS mean_dollars,
       |  CASE WHEN n >= 2 AND m2 > 0 THEN
       |    ${r4Sql("SQRT(m2) / 100.0")} END AS stddev_dollars,
       |  CASE WHEN n >= 2 AND m2 > 0 THEN
       |    ${r4Sql("m3 / (m2 * SQRT(m2))")} END AS skewness,
       |  CASE WHEN n >= 2 AND m2 > 0 THEN
       |    ${r4Sql("m4 / (m2 * m2) - 3.0")} END AS kurtosis_excess
       |FROM m ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- #354
  /** #354 winsorized mean — the robust-metrics read every
    * experimentation platform puts beside the plain mean (one whale
    * purchase can swing a per-type average; clipping at exact
    * [p5, p95] order statistics is the standard fix, and the
    * plain-vs-winsorized gap IS the tail-influence diagnostic that
    * #352's kurtosis flags in the abstract). Percentile bounds are
    * EXACT multiset order statistics — the value at position
    * ⌈0.05n⌉ / ⌈0.95n⌉ of the (cents asc, event_id) order, all
    * integer (no interpolation, no cross-engine percentile-semantics
    * drift); clipping and both sums stay in exact cents/DECIMAL;
    * doubles only in the final r4'd divisions.
    *
    * Scale: one rank window per type (the #17 WindowGroupLimit class
    * does not apply — every row needs its clip — but the sort is the
    * per-type event sort any percentile needs), then a map-side-
    * combinable clipped rollup against the broadcast 5-row bounds.
    */
  def aggWinsorizedMean(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = Tables.eventsUs(spark, dir)
      .select(col("event_type"), col("event_id"), expr(centsExpr).as("c"))
    val wr = Window.partitionBy("event_type")
      .orderBy(col("c"), col("event_id"))
    val wn = Window.partitionBy("event_type")
    val ranked = e.withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
    val bounds = ranked.groupBy("event_type")
      .agg(max("n").as("n"),
        max(when(col("rn") === expr("(n + 19) div 20"), col("c")))
          .as("p05_cents"),
        max(when(col("rn") === expr("(19 * n + 19) div 20"), col("c")))
          .as("p95_cents"))
    e.join(broadcast(bounds), "event_type")
      .withColumn("cw", least(greatest(col("c"), col("p05_cents")),
        col("p95_cents")))
      .groupBy("event_type")
      .agg(max("n").as("n"), max("p05_cents").as("p05_cents"),
        max("p95_cents").as("p95_cents"),
        sum(col("c").cast(dec)).as("s"),
        sum(col("cw").cast(dec)).as("sw"),
        sum(when(col("c") < col("p05_cents"), 1L)
          .when(col("c") > col("p95_cents"), 1L).otherwise(0L))
          .as("n_clipped"))
      .select(col("event_type"), col("n"), col("p05_cents"),
        col("p95_cents"), col("n_clipped"),
        r4(col("s").cast("double") / col("n").cast("double") / 100.0)
          .as("mean_dollars"),
        r4(col("sw").cast("double") / col("n").cast("double") / 100.0)
          .as("winsorized_mean_dollars"))
      .orderBy("event_type")
  }

  val aggWinsorizedMeanSql: String =
    s"""WITH e AS (
       |  SELECT event_type, event_id, $centsSql AS c FROM events),
       |r AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY c, event_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM e),
       |b AS (
       |  SELECT event_type, MAX(n) AS n,
       |    MAX(CASE WHEN rn = (n + 19) // 20 THEN c END) AS p05_cents,
       |    MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN c END)
       |      AS p95_cents
       |  FROM r GROUP BY 1),
       |w AS (
       |  SELECT e.event_type, b.n, b.p05_cents, b.p95_cents, e.c,
       |    LEAST(GREATEST(e.c, b.p05_cents), b.p95_cents) AS cw
       |  FROM e JOIN b ON e.event_type = b.event_type)
       |SELECT event_type, n, p05_cents, p95_cents,
       |  CAST(COUNT(*) FILTER (WHERE c < p05_cents OR c > p95_cents)
       |    AS BIGINT) AS n_clipped,
       |  ${r4Sql("CAST(SUM(c::HUGEINT) AS DOUBLE) / " +
                  "CAST(MAX(n) AS DOUBLE) / 100.0")} AS mean_dollars,
       |  ${r4Sql("CAST(SUM(cw::HUGEINT) AS DOUBLE) / " +
                  "CAST(MAX(n) AS DOUBLE) / 100.0")}
       |    AS winsorized_mean_dollars
       |FROM w GROUP BY event_type, n, p05_cents, p95_cents
       |ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_winsorized_mean" -> (aggWinsorizedMean _),
    "agg_moments_skew" -> (aggMomentsSkew _),
    "stats_ks_test" -> (statsKsTest _),
    "stats_mannwhitney" -> (statsMannWhitney _),
    "stats_welch_t" -> (statsWelchT _),
    "stats_cramers_v" -> (statsCramersV _),
    "stats_benford" -> (statsBenford _),
    "ts_max_drawdown" -> (tsMaxDrawdown _),
    "mm_image_edges" -> (mmImageEdges _))

  val oracles: Map[String, String] = Map(
    "agg_winsorized_mean" -> aggWinsorizedMeanSql,
    "agg_moments_skew" -> aggMomentsSkewSql,
    "stats_ks_test" -> statsKsTestSql,
    "stats_mannwhitney" -> statsMannWhitneySql,
    "stats_welch_t" -> statsWelchTSql,
    "stats_cramers_v" -> statsCramersVSql,
    "stats_benford" -> statsBenfordSql,
    "ts_max_drawdown" -> tsMaxDrawdownSql,
    "mm_image_edges" -> mmImageEdgesSql)
}
