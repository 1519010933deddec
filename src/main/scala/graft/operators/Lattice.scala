package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Exprs.{r4, r4Sql, sumDec, sumDecSql}

/** Round-17 widening (SURVEY.md §2 #307-312): the experiment-design
  * half of the stats kit — one-way ANOVA across all groups (#307, the
  * k-group graduate of #302's pairwise t), minimum detectable effect
  * and required sample size (#308, the read run BEFORE an experiment;
  * #300-302 are the reads run after), a Poisson-bootstrap confidence
  * interval (#309 — THE distributed bootstrap: per-row independent
  * weights make it one-pass and mergeable, which is why production
  * metric platforms use it at petabyte scale), CUPED variance
  * reduction (#310, the industry-standard pre-period adjustment),
  * Fleiss' κ over the four quality gates as raters (#311, the
  * multi-rater graduate of #265's pairwise Cohen), and seasonal
  * strength (#312, the variance-explained summary of #229's
  * decomposition).
  *
  * Cross-engine exactness: integer cents and counts throughout;
  * DECIMAL(38,0) moments; doubles only in final expression trees over
  * exact integers (r4'd) or as round-trip E0 literals. The bootstrap
  * weights are drawn from md5 in INTEGER space (thresholded at
  * e⁻¹-derived 10⁻⁶ cutoffs), so both engines replicate the identical
  * resamples — determinism by construction, not by tolerance.
  */
object Lattice {

  private val centsExpr = "cast(floor(value * 100.0 + 0.5) as bigint)"
  private val centsSql = "CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)"
  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)

  // --------------------------------------------------------------- #307
  /** #307 one-way ANOVA of event value across all 5 types: F =
    * (SSB/(k−1))/(SSW/(n−k)) from one scan of exact DECIMAL moments.
    * Σᵢ Sᵢ²/nᵢ crosses the 5-term sum through sumDec (each term is
    * one IEEE division of exact decimals); SSB/SSW are then single
    * expressions over that and the exact totals. The verdict uses the
    * df₂=∞ critical value 2.3719 for df₁=4 (documented asymptotic —
    * at n in the thousands the finite-df critical differs in the 3rd
    * decimal; both engines compare the identical double).
    */
  def statsAnova(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.eventsUs(spark, dir)
      .select(col("event_type"), expr(centsExpr).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(dec)).as("s"),
        sum((col("c") * col("c")).cast(dec)).as("q"))
    val term = (col("s") * col("s")).cast("double") / col("n").cast("double")
    val agg = m.agg(
      count(lit(1)).as("k"),
      sum("n").as("n"),
      sum(col("s")).as("st"),
      sum(col("q")).as("qt"),
      sumDec(term, 38, 8).as("sb"))
    val ssb = col("sb") -
      (col("st") * col("st")).cast("double") / col("n").cast("double")
    val ssw = col("qt").cast("double") - col("sb")
    val f = (ssb / (col("k") - 1).cast("double")) /
      (ssw / (col("n") - col("k")).cast("double"))
    // degenerate guards: one group (k=1), no residual df (n=k), or
    // zero within-variance would be Spark NaN/Inf vs DuckDB NULL —
    // gate both sides explicitly
    val ok = col("k") > 1L && col("n") > col("k") && ssw > 0.0
    agg.select(col("k"), col("n"),
      r4(ssb / lit(10000.0)).as("ssb_dollars2"),
      r4(ssw / lit(10000.0)).as("ssw_dollars2"),
      (col("k") - 1).as("df1"), (col("n") - col("k")).as("df2"),
      when(ok, r4(f)).as("f_stat"),
      when(ok, f > expr("2.3719E0")).as("reject_05_asymp"))
  }

  val statsAnovaSql: String =
    s"""WITH m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(($centsSql)::HUGEINT) AS s,
       |    SUM(($centsSql)::HUGEINT * ($centsSql)) AS q
       |  FROM events GROUP BY 1),
       |a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
       |    CAST(SUM(n) AS BIGINT) AS n,
       |    SUM(s) AS st, SUM(q) AS qt,
       |    ${sumDecSql(
            "CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)", 38, 8)} AS sb
       |  FROM m),
       |d AS (
       |  SELECT k, n,
       |    sb - CAST(st * st AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
       |    CAST(qt AS DOUBLE) - sb AS ssw
       |  FROM a)
       |SELECT k, n,
       |  ${r4Sql("ssb / 10000.0")} AS ssb_dollars2,
       |  ${r4Sql("ssw / 10000.0")} AS ssw_dollars2,
       |  k - 1 AS df1, n - k AS df2,
       |  CASE WHEN k > 1 AND n > k AND ssw > 0 THEN
       |    ${r4Sql("(ssb / CAST(k - 1 AS DOUBLE)) / " +
                    "(ssw / CAST(n - k AS DOUBLE))")}
       |  END AS f_stat,
       |  CASE WHEN k > 1 AND n > k AND ssw > 0 THEN
       |    (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE))
       |      > 2.3719E0
       |  END AS reject_05_asymp
       |FROM d""".stripMargin

  // --------------------------------------------------------------- #308
  /** #308 experiment sizing per type pair: the minimum detectable
    * effect at the CURRENT sample sizes and the per-arm n required to
    * detect the OBSERVED effect — both at α=0.05 two-sided, power
    * 0.8 (z constants 1.959964/0.841621 as round-trip literals).
    * mde = (z_α + z_β)·√(v₁/n₁ + v₂/n₂); n_req/arm = (z_α+z_β)²·
    * (v₁+v₂)/δ². The #302 exact-moment scan, re-read for design
    * instead of inference.
    */
  def statsPowerMde(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.eventsUs(spark, dir)
      .select(col("event_type"), expr(centsExpr).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(dec)).as("s"),
        sum((col("c") * col("c")).cast(dec)).as("q"))
    def v(p: String): Column = {
      val n = col(s"$p.n")
      (n.cast(dec) * col(s"$p.q") - col(s"$p.s") * col(s"$p.s"))
        .cast("double") / (n.cast(dec) * (n - 1)).cast("double")
    }
    val z = expr("1.959964E0 + 0.841621E0")
    val delta = col("a.s").cast("double") / col("a.n").cast("double") -
      col("b.s").cast("double") / col("b.n").cast("double")
    broadcast(m.as("a")).join(broadcast(m.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        r4(delta / lit(100.0)).as("observed_diff"),
        // n ≤ 1 guard: variance undefined — Spark NaN vs DuckDB NULL
        when(col("a.n") > 1L && col("b.n") > 1L,
          r4(z * sqrt(v("a") / col("a.n").cast("double") +
            v("b") / col("b.n").cast("double")) / lit(100.0)))
          .as("mde_dollars"),
        when(col("a.n") > 1L && col("b.n") > 1L && abs(delta) > 1e-9,
          r4(z * z * (v("a") + v("b")) / (delta * delta)))
          .as("n_req_per_arm"))
      .orderBy("type_a", "type_b")
  }

  val statsPowerMdeSql: String =
    s"""WITH m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(($centsSql)::HUGEINT) AS s,
       |    SUM(($centsSql)::HUGEINT * ($centsSql)) AS q
       |  FROM events GROUP BY 1),
       |p AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    a.n AS n1, b.n AS n2,
       |    CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
       |      - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS delta,
       |    CAST(a.n::HUGEINT * a.q - a.s * a.s AS DOUBLE) /
       |      CAST(a.n::HUGEINT * (a.n - 1) AS DOUBLE) AS va,
       |    CAST(b.n::HUGEINT * b.q - b.s * b.s AS DOUBLE) /
       |      CAST(b.n::HUGEINT * (b.n - 1) AS DOUBLE) AS vb
       |  FROM m a JOIN m b ON a.event_type < b.event_type)
       |SELECT type_a, type_b,
       |  ${r4Sql("delta / 100.0")} AS observed_diff,
       |  CASE WHEN n1 > 1 AND n2 > 1 THEN
       |    ${r4Sql("(1.959964E0 + 0.841621E0) * " +
                    "SQRT(va / CAST(n1 AS DOUBLE) + vb / CAST(n2 AS DOUBLE))" +
                    " / 100.0")}
       |  END AS mde_dollars,
       |  CASE WHEN n1 > 1 AND n2 > 1 AND ABS(delta) > 1e-9 THEN
       |    ${r4Sql("(1.959964E0 + 0.841621E0) * " +
                    "(1.959964E0 + 0.841621E0) * (va + vb) / " +
                    "(delta * delta)")}
       |  END AS n_req_per_arm
       |FROM p ORDER BY type_a, type_b""".stripMargin

  // --------------------------------------------------------------- #309
  /** #309 Poisson-bootstrap 95% CI for the mean purchase value — the
    * one-pass distributed bootstrap: each row draws an INDEPENDENT
    * replication weight per resample (≈Poisson(1), truncated at 4),
    * so the B=40 resamples build in a single scan with map-side
    * partial aggregation and NO resample-sized shuffles — the reason
    * this bootstrap (and not index resampling) is what metric
    * platforms run at petabyte scale.
    *
    * Determinism: weights come from md5(event_id ':' b) mod 10⁶
    * compared against the INTEGER thresholds 367879/735759/919699/
    * 981012 (cumulative e⁻¹·Σ1/k! rounded to 10⁻⁶ — these integers
    * ARE the weight distribution, so both engines draw identical
    * resamples; truncation mass 0.018988 lands on weight 4). CI
    * bounds are the 2nd and 39th order statistics of the 40 resample
    * means — the symmetric (B+1)-quantile convention: drop the single
    * lowest and single highest of B=40, i.e. ranks ⌈0.025·(B+1)⌉ = 2
    * and B+1−2 = 39 (low-rank-on-ties via the mean's exact sums
    * ordering).
    */
  def statsBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.eventsUs(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), expr(centsExpr).as("c"))
    val reps = p
      .select(col("event_id"), col("c"),
        explode(expr("sequence(0, 39)")).as("b"))
      .withColumn("h", expr(
        """conv(substring(md5(concat(cast(event_id as string), ':',
          |  cast(b as string))), 1, 15), 16, 10)""".stripMargin)
        .cast("long") % 1000000L)
      .withColumn("w",
        when(col("h") < 367879L, 0L)
          .when(col("h") < 735759L, 1L)
          .when(col("h") < 919699L, 2L)
          .when(col("h") < 981012L, 3L)
          .otherwise(4L))
    val means = reps.groupBy("b")
      .agg(sum((col("w") * col("c")).cast(dec)).as("sw"),
        sum(col("w")).as("nw"))
      .where(col("nw") > 0L)
      .select(col("b"),
        (col("sw").cast("double") / col("nw").cast("double")).as("mb"),
        col("sw"), col("nw"))
    val wrk = Window.orderBy(col("mb"), col("b")) // 40 rows — bounded
    // both CI bounds off ONE pass of the 40-row rank table (two
    // filters would recompute the whole resample subtree twice)
    val ci = means.withColumn("rk", row_number().over(wrk))
      .agg(max(when(col("rk") === 2, col("mb"))).as("lo"),
        max(when(col("rk") === 39, col("mb"))).as("hi"))
    val obs = p.agg(count(lit(1)).as("n"),
      sum(col("c").cast(dec)).as("s"))
    obs.crossJoin(broadcast(ci))
      .select(col("n"), lit(40L).as("n_resamples"),
        r4(col("s").cast("double") / col("n").cast("double") / 100.0)
          .as("obs_mean_dollars"),
        r4(col("lo") / 100.0).as("ci_lo_dollars"),
        r4(col("hi") / 100.0).as("ci_hi_dollars"))
  }

  val statsBootstrapCiSql: String =
    s"""WITH p AS (
       |  SELECT event_id, $centsSql AS c FROM events
       |  WHERE event_type = 'purchase'),
       |reps AS (
       |  SELECT c, b,
       |    ('0x' || substr(md5(event_id || ':' || b), 1, 15))::UBIGINT
       |      % 1000000 AS h
       |  FROM p, unnest(range(0, 40)) AS u(b)),
       |w AS (
       |  SELECT b, c, CASE WHEN h < 367879 THEN 0 WHEN h < 735759 THEN 1
       |    WHEN h < 919699 THEN 2 WHEN h < 981012 THEN 3 ELSE 4 END AS w
       |  FROM reps),
       |means AS (
       |  SELECT b, SUM(w::HUGEINT * c) AS sw,
       |    CAST(SUM(w) AS BIGINT) AS nw
       |  FROM w GROUP BY 1 HAVING SUM(w) > 0),
       |rk AS (
       |  SELECT CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE) AS mb,
       |    ROW_NUMBER() OVER (
       |      ORDER BY CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE), b) AS rk
       |  FROM means),
       |obs AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(c::HUGEINT) AS s
       |  FROM p)
       |SELECT n, CAST(40 AS BIGINT) AS n_resamples,
       |  ${r4Sql("CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0")}
       |    AS obs_mean_dollars,
       |  ${r4Sql("(SELECT mb FROM rk WHERE rk = 2) / 100.0")}
       |    AS ci_lo_dollars,
       |  ${r4Sql("(SELECT mb FROM rk WHERE rk = 39) / 100.0")}
       |    AS ci_hi_dollars
       |FROM obs""".stripMargin

  // --------------------------------------------------------------- #310
  /** #310 CUPED variance reduction per event type: split the horizon
    * at the integer midpoint day, per (type, user) sum pre-period x
    * and post-period y cents, and compute θ = cov(x,y)/var(x) and the
    * variance reduction ρ² from exact DECIMAL moments over users —
    * the pre-period adjustment every experimentation platform applies
    * before reading a movement. Users active in only one period
    * participate with the natural zero (that IS the estimator — their
    * pre-exposure signal is zero, not missing).
    *
    * Scale: one grouped shuffle to (type, user), one to the per-type
    * moments; the midpoint attaches by broadcast.
    */
  def eventsCuped(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val e = Tables.eventsUs(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr(s"ts_us div $dayUs").as("d"), expr(centsExpr).as("c"))
    val mid = e.agg(((min("d") + max("d") + 1L) / 2L).cast("long")
      .as("mid"))
    val xy = e.crossJoin(broadcast(mid))
      .groupBy("event_type", "user_id")
      .agg(sum(when(col("d") < col("mid"), col("c")).otherwise(0L))
          .as("x"),
        sum(when(col("d") >= col("mid"), col("c")).otherwise(0L))
          .as("y"))
    val m = xy.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("y") * col("y")).cast(dec)).as("syy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"))
    val n = col("n_users").cast(dec)
    val covN = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    val vxN = (n * col("sxx") - col("sx") * col("sx")).cast("double")
    val vyN = (n * col("syy") - col("sy") * col("sy")).cast("double")
    m.select(col("event_type"), col("n_users"),
      when(vxN > 0.0, r4(covN / vxN)).as("theta"),
      when(vxN > 0.0 && vyN > 0.0,
        r4(covN * covN / (vxN * vyN))).as("var_reduction"))
      .orderBy("event_type")
  }

  val eventsCupedSql: String =
    s"""WITH e AS (
       |  SELECT event_type, user_id, epoch_us(ts) // 86400000000 AS d,
       |    $centsSql AS c
       |  FROM events),
       |mid AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS mid FROM e),
       |xy AS (
       |  SELECT event_type, user_id,
       |    CAST(SUM(CASE WHEN d < mid THEN c ELSE 0 END) AS BIGINT) AS x,
       |    CAST(SUM(CASE WHEN d >= mid THEN c ELSE 0 END) AS BIGINT) AS y
       |  FROM e, mid GROUP BY 1, 2),
       |m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       |    SUM(x::HUGEINT) AS sx, SUM(y::HUGEINT) AS sy,
       |    SUM(x::HUGEINT * x) AS sxx, SUM(y::HUGEINT * y) AS syy,
       |    SUM(x::HUGEINT * y) AS sxy
       |  FROM xy GROUP BY 1)
       |SELECT event_type, n_users,
       |  CASE WHEN CAST(n_users::HUGEINT * sxx - sx * sx AS DOUBLE) > 0
       |    THEN ${r4Sql(
              "CAST(n_users::HUGEINT * sxy - sx * sy AS DOUBLE) / " +
              "CAST(n_users::HUGEINT * sxx - sx * sx AS DOUBLE)")}
       |  END AS theta,
       |  CASE WHEN CAST(n_users::HUGEINT * sxx - sx * sx AS DOUBLE) > 0
       |    AND CAST(n_users::HUGEINT * syy - sy * sy AS DOUBLE) > 0
       |    THEN ${r4Sql(
              "CAST(n_users::HUGEINT * sxy - sx * sy AS DOUBLE) * " +
              "CAST(n_users::HUGEINT * sxy - sx * sy AS DOUBLE) / " +
              "(CAST(n_users::HUGEINT * sxx - sx * sx AS DOUBLE) * " +
              "CAST(n_users::HUGEINT * syy - sy * sy AS DOUBLE))")}
       |  END AS var_reduction
       |FROM m ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- #311
  /** #311 Fleiss' κ over the four #81 quality gates as raters: do the
    * gates agree on WHICH documents are bad beyond the agreement
    * their fire rates force? P̄ comes from the exact identity
    * Σᵢ Σⱼ nᵢⱼ(nᵢⱼ−1) = 2·Σfᵢ² − 8·Σfᵢ + 12N for r=4 binary raters
    * (fᵢ = #gates firing on doc i), so the whole statistic reduces to
    * TWO integer sums over one doc scan; Pₑ = p₀² + p₁² from the
    * marginal fire mass. κ is one r4'd IEEE expression — the
    * multi-rater graduate of #265's pairwise Cohen κ.
    */
  def qualityFleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val f = Pinnacle.ruleFlags(spark, dir)
      .select((col("f0") + col("f1") + col("f2") + col("f3")).as("fi"))
    val agg = f.agg(count(lit(1)).as("n"),
      sum("fi").as("a"),
      sum(col("fi") * col("fi")).as("b"))
    val n = col("n").cast("double")
    val pbar = (col("b") * 2L - col("a") * 8L + col("n") * 12L)
      .cast("double") / (n * 12.0)
    val p1 = col("a").cast("double") / (n * 4.0)
    val pe = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
    agg.select(col("n").as("n_docs"), col("a").as("total_fires"),
      r4(pbar).as("p_bar"), r4(pe).as("p_e"),
      when(pe < 1.0, r4((pbar - pe) / (lit(1.0) - pe))).as("fleiss_kappa"))
  }

  val qualityFleissKappaSql: String =
    s"""WITH ${Pinnacle.ruleFlagsCtesSql},
       |fi AS (SELECT f0 + f1 + f2 + f3 AS fi FROM fl),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(fi) AS BIGINT) AS a,
       |    CAST(SUM(fi * fi) AS BIGINT) AS b
       |  FROM fi),
       |kd AS (
       |  SELECT n, a,
       |    CAST(b * 2 - a * 8 + n * 12 AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * 12.0) AS pbar,
       |    CAST(a AS DOUBLE) / (CAST(n AS DOUBLE) * 4.0) AS p1
       |  FROM agg)
       |SELECT n AS n_docs, a AS total_fires,
       |  ${r4Sql("pbar")} AS p_bar,
       |  ${r4Sql("p1 * p1 + (1.0 - p1) * (1.0 - p1)")} AS p_e,
       |  CASE WHEN p1 * p1 + (1.0 - p1) * (1.0 - p1) < 1.0 THEN
       |    ${r4Sql("(pbar - (p1 * p1 + (1.0 - p1) * (1.0 - p1))) / " +
                    "(1.0 - (p1 * p1 + (1.0 - p1) * (1.0 - p1)))")}
       |  END AS fleiss_kappa
       |FROM kd""".stripMargin

  // --------------------------------------------------------------- #312
  /** #312 seasonal strength per event type: 1 − Var(residual)/
    * Var(detrended), the variance-explained summary of #229's
    * decomposition. Detrending stays INTEGER by working in 7× space
    * (det7 = 7y − Σ₋₃..₊₃ y over a CALENDAR range frame, full windows
    * only — gaps in the daily axis can't smear the MA); the weekday
    * means subtract as one IEEE term per row whose sums cross through
    * sumDec (exact, order-free; Σ(det−mean_dow) is identically 0 in
    * exact arithmetic and lands on the same rounded value on both
    * engines). Strength clamps at 0 (the #218 device).
    */
  def tsSeasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val daily = Tables.eventsUs(spark, dir)
      .groupBy(col("event_type"), expr(s"ts_us div $dayUs").as("d"))
      .agg(sum(expr(centsExpr)).as("y"))
    val wr = Window.partitionBy("event_type").orderBy("d")
      .rangeBetween(-3, 3)
    val det = daily
      .withColumn("cnt", count(lit(1)).over(wr))
      .withColumn("sum7", sum("y").over(wr))
      .where(col("cnt") === 7L)
      .select(col("event_type"), col("d"),
        (col("y") * 7L - col("sum7")).as("det7"),
        expr("(d + 4) % 7").as("dow"))
    val dmeans = det.groupBy("event_type", "dow")
      .agg(sum(col("det7").cast(dec)).as("sd"),
        count(lit(1)).as("cd"))
    val joined = det.join(broadcast(dmeans), Seq("event_type", "dow"))
      .withColumn("r", col("det7").cast("double") -
        col("sd").cast("double") / col("cd").cast("double"))
    val m = joined.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("det7").cast(dec)).as("s1"),
        sum((col("det7") * col("det7")).cast(dec)).as("s2"),
        sumDec(col("r"), 38, 6).as("rs1"),
        sumDec(col("r") * col("r"), 38, 6).as("rs2"))
    val n = col("n_days").cast("double")
    val varD = col("s2").cast("double") / n -
      (col("s1").cast("double") / n) * (col("s1").cast("double") / n)
    val varR = col("rs2") / n - (col("rs1") / n) * (col("rs1") / n)
    m.select(col("event_type"), col("n_days"),
      when(varD > 0.0, r4(greatest(lit(0.0), lit(1.0) - varR / varD)))
        .as("seasonal_strength"))
      .orderBy("event_type")
  }

  val tsSeasonalStrengthSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
       |    CAST(SUM($centsSql) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |det AS (
       |  SELECT event_type, d, y * 7 - sum7 AS det7, (d + 4) % 7 AS dow
       |  FROM (
       |    SELECT event_type, d, y,
       |      COUNT(*) OVER w AS cnt, CAST(SUM(y) OVER w AS BIGINT) AS sum7
       |    FROM daily
       |    WINDOW w AS (PARTITION BY event_type ORDER BY d
       |      RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING))
       |  WHERE cnt = 7),
       |dm AS (
       |  SELECT event_type, dow, SUM(det7::HUGEINT) AS sd,
       |    CAST(COUNT(*) AS BIGINT) AS cd
       |  FROM det GROUP BY 1, 2),
       |r AS (
       |  SELECT det.event_type, det7,
       |    CAST(det7 AS DOUBLE)
       |      - CAST(sd AS DOUBLE) / CAST(cd AS DOUBLE) AS r
       |  FROM det JOIN dm ON det.event_type = dm.event_type
       |    AND det.dow = dm.dow),
       |m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    SUM(det7::HUGEINT) AS s1, SUM(det7::HUGEINT * det7) AS s2,
       |    ${sumDecSql("r", 38, 6)} AS rs1,
       |    ${sumDecSql("r * r", 38, 6)} AS rs2
       |  FROM r GROUP BY 1),
       |v AS (
       |  SELECT event_type, n_days,
       |    CAST(s2 AS DOUBLE) / CAST(n_days AS DOUBLE)
       |      - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
       |      * (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) AS vd,
       |    rs2 / CAST(n_days AS DOUBLE)
       |      - (rs1 / CAST(n_days AS DOUBLE))
       |      * (rs1 / CAST(n_days AS DOUBLE)) AS vr
       |  FROM m)
       |SELECT event_type, n_days,
       |  CASE WHEN vd > 0 THEN
       |    ${r4Sql("GREATEST(0.0E0, 1.0E0 - vr / vd)")}
       |  END AS seasonal_strength
       |FROM v ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- #318
  /** #318 two-regressor OLS (value ~ hour-of-day + weekday, with
    * intercept) solved in CLOSED FORM: one scan reduces to the nine
    * exact DECIMAL moments of the normal equations, Cramer's rule on
    * the 3×3 X'X solves for the coefficients, and R² comes from the
    * normal-equations identity SSE = Σy² − b·X'y — no iteration, no
    * gradient, no per-row residual pass. The multivariate graduate of
    * #142's one-regressor trend; the hour/weekday design doubles as a
    * seasonality decomposition check against #115/#312.
    *
    * Exactness: regressors are pure integer time arithmetic (hour =
    * (ts_us div 3600·10⁶) mod 24, dow = (day+4) mod 7); ALL moments
    * accumulate in DECIMAL(38,0); determinants and coefficients are
    * fixed IEEE trees over the decimal-cast moments (each cast
    * correctly rounded identically on both engines), r4'd. Guards: a
    * singular X'X (constant regressor) or zero SST gates to null on
    * both engines (the x/0 divergence class).
    *
    * Scale: ONE map-side-combinable aggregate — the entire regression
    * is 10 numbers crossing the shuffle, at any corpus size.
    */
  def statsOls2var(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.eventsUs(spark, dir)
      .select(expr(centsExpr).as("y"),
        expr("(ts_us div 3600000000) % 24").as("x1"),
        expr("(ts_us div 86400000000 + 4) % 7").as("x2"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1").cast(dec)).as("s1"),
        sum(col("x2").cast(dec)).as("s2"),
        sum((col("x1") * col("x1")).cast(dec)).as("s11"),
        sum((col("x2") * col("x2")).cast(dec)).as("s22"),
        sum((col("x1") * col("x2")).cast(dec)).as("s12"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x1") * col("y")).cast(dec)).as("s1y"),
        sum((col("x2") * col("y")).cast(dec)).as("s2y"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
    def d(c: String): org.apache.spark.sql.Column = col(c).cast("double")
    val (n, s1, s2, s11, s22, s12, sy, s1y, s2y, syy) =
      (d("n"), d("s1"), d("s2"), d("s11"), d("s22"), d("s12"),
        d("sy"), d("s1y"), d("s2y"), d("syy"))
    def det3(a1: org.apache.spark.sql.Column, a2: org.apache.spark.sql.Column,
        a3: org.apache.spark.sql.Column, b1: org.apache.spark.sql.Column,
        b2: org.apache.spark.sql.Column, b3: org.apache.spark.sql.Column,
        c1: org.apache.spark.sql.Column, c2: org.apache.spark.sql.Column,
        c3: org.apache.spark.sql.Column) =
      a1 * (b2 * c3 - b3 * c2) - a2 * (b1 * c3 - b3 * c1) +
        a3 * (b1 * c2 - b2 * c1)
    val dd = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val d0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val d1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val d2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    val b0 = d0 / dd
    val b1 = d1 / dd
    val b2 = d2 / dd
    val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    val sst = syy - sy * sy / n
    m.select(col("n").cast("long").as("n"),
      when(dd =!= 0.0, r4(b0 / lit(100.0))).as("intercept_dollars"),
      when(dd =!= 0.0, r4(b1 / lit(100.0))).as("beta_hour_dollars"),
      when(dd =!= 0.0, r4(b2 / lit(100.0))).as("beta_dow_dollars"),
      when(dd =!= 0.0 && sst > 0.0,
        r4(lit(1.0) - sse / sst)).as("r_squared"))
  }

  val statsOls2varSql: String = {
    val det3 = (a1: String, a2: String, a3: String, b1: String,
        b2: String, b3: String, c1: String, c2: String, c3: String) =>
      s"$a1 * ($b2 * $c3 - $b3 * $c2) - $a2 * ($b1 * $c3 - $b3 * $c1)" +
        s" + $a3 * ($b1 * $c2 - $b2 * $c1)"
    s"""WITH e AS (
       |  SELECT $centsSql AS y,
       |    (epoch_us(ts) // 3600000000) % 24 AS x1,
       |    (epoch_us(ts) // 86400000000 + 4) % 7 AS x2
       |  FROM events),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS nn,
       |    SUM(x1::HUGEINT) AS s1, SUM(x2::HUGEINT) AS s2,
       |    SUM(x1::HUGEINT * x1) AS s11, SUM(x2::HUGEINT * x2) AS s22,
       |    SUM(x1::HUGEINT * x2) AS s12, SUM(y::HUGEINT) AS sy,
       |    SUM(x1::HUGEINT * y) AS s1y, SUM(x2::HUGEINT * y) AS s2y,
       |    SUM(y::HUGEINT * y) AS syy
       |  FROM e),
       |f AS (
       |  SELECT nn, CAST(nn AS DOUBLE) AS n,
       |    CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
       |    CAST(s11 AS DOUBLE) AS s11, CAST(s22 AS DOUBLE) AS s22,
       |    CAST(s12 AS DOUBLE) AS s12, CAST(sy AS DOUBLE) AS sy,
       |    CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
       |    CAST(syy AS DOUBLE) AS syy
       |  FROM m),
       |dets AS (
       |  SELECT nn, sy, s1y, s2y, syy, n,
       |    ${det3("n", "s1", "s2", "s1", "s11", "s12",
                   "s2", "s12", "s22")} AS dd,
       |    ${det3("sy", "s1", "s2", "s1y", "s11", "s12",
                   "s2y", "s12", "s22")} AS d0,
       |    ${det3("n", "sy", "s2", "s1", "s1y", "s12",
                   "s2", "s2y", "s22")} AS d1,
       |    ${det3("n", "s1", "sy", "s1", "s11", "s1y",
                   "s2", "s12", "s2y")} AS d2
       |  FROM f)
       |SELECT nn AS n,
       |  CASE WHEN dd <> 0 THEN ${r4Sql("d0 / dd / 100.0")}
       |    END AS intercept_dollars,
       |  CASE WHEN dd <> 0 THEN ${r4Sql("d1 / dd / 100.0")}
       |    END AS beta_hour_dollars,
       |  CASE WHEN dd <> 0 THEN ${r4Sql("d2 / dd / 100.0")}
       |    END AS beta_dow_dollars,
       |  CASE WHEN dd <> 0 AND syy - sy * sy / n > 0 THEN
       |    ${r4Sql("1.0E0 - (syy - (d0 / dd) * sy - (d1 / dd) * s1y" +
                    " - (d2 / dd) * s2y) / (syy - sy * sy / n)")}
       |  END AS r_squared
       |FROM dets""".stripMargin
  }

  // ----------------------------------------------------------------
  // --------------------------------------------------------------- #325
  /** #325 two-proportion z-test on conversion — the RATE counterpart
    * of #302's Welch t on means, closing the experimentation kit's
    * most-used read (most A/B decisions are conversion decisions):
    * unit = user, exposed = any event, converted = ≥1 HIGH-VALUE
    * purchase (value > 200 — plain "any purchase" saturates at 100%
    * conversion in this event stream and the test degenerates),
    * variant = the #112 user-parity split. z uses the pooled standard
    * error, z = (p_b − p_a) / √(p̂(1−p̂)(1/n_a + 1/n_b)) with
    * p̂ = (x_a+x_b)/(n_a+n_b).
    *
    * Exactness: the four counts are exact integers; every emitted
    * double is IEEE over those integers, identically evaluated on
    * both engines (the stats-kit discipline), r4'd at the edge. The
    * significance flag compares the UNROUNDED |z| to 1.96 — the same
    * IEEE value both sides, so the boolean is exact too. Degenerate
    * designs (an empty arm, p̂ ∈ {0,1} zeroing the pooled variance)
    * gate z and the flag to null on both engines.
    *
    * Scale: one user-grouped shuffle to per-user conversion flags,
    * then a 2-row variant rollup — map-side combinable throughout.
    */
  def statsTwoProportion(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.eventsUs(spark, dir)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" &&
        col("value") > 200.0, 1L).otherwise(0L)).as("converted"))
      .withColumn("variant",
        when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
    val s = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("converted").as("x"))
    val wide = s.agg(
      max(when(col("variant") === "A", col("n"))).as("na"),
      max(when(col("variant") === "B", col("n"))).as("nb"),
      max(when(col("variant") === "A", col("x"))).as("xa"),
      max(when(col("variant") === "B", col("x"))).as("xb"))
    val pa = col("xa").cast("double") / col("na").cast("double")
    val pb = col("xb").cast("double") / col("nb").cast("double")
    val pPool = (col("xa") + col("xb")).cast("double") /
      (col("na") + col("nb")).cast("double")
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("na").cast("double") +
        lit(1.0) / col("nb").cast("double")))
    val zCol = (pb - pa) / se
    val ok = col("na").isNotNull && col("nb").isNotNull &&
      col("na") > 0L && col("nb") > 0L &&
      (col("xa") + col("xb")) > 0L &&
      (col("xa") + col("xb")) < (col("na") + col("nb"))
    wide.select(
      col("na").as("users_a"), col("nb").as("users_b"),
      col("xa").as("conv_a"), col("xb").as("conv_b"),
      r4(pa).as("rate_a"), r4(pb).as("rate_b"),
      when(ok, r4(zCol)).as("z"),
      when(ok, abs(zCol) > 1.96).as("significant_95"))
  }

  val statsTwoProportionSql: String = {
    val pa = "CAST(xa AS DOUBLE) / CAST(na AS DOUBLE)"
    val pb = "CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE)"
    val pp = "CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE)"
    val z = s"($pb - $pa) / SQRT(($pp) * (1.0 - ($pp)) " +
      "* (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE)))"
    val ok = "na IS NOT NULL AND nb IS NOT NULL AND na > 0 AND nb > 0 " +
      "AND xa + xb > 0 AND xa + xb < na + nb"
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 200.0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS converted,
       |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM events GROUP BY user_id),
       |s AS (
       |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(converted) AS BIGINT) AS x
       |  FROM pu GROUP BY variant),
       |w AS (
       |  SELECT MAX(CASE WHEN variant = 'A' THEN n END) AS na,
       |    MAX(CASE WHEN variant = 'B' THEN n END) AS nb,
       |    MAX(CASE WHEN variant = 'A' THEN x END) AS xa,
       |    MAX(CASE WHEN variant = 'B' THEN x END) AS xb
       |  FROM s)
       |SELECT na AS users_a, nb AS users_b, xa AS conv_a, xb AS conv_b,
       |  ${r4Sql(pa)} AS rate_a, ${r4Sql(pb)} AS rate_b,
       |  CASE WHEN $ok THEN ${r4Sql(z)} END AS z,
       |  CASE WHEN $ok THEN ABS($z) > 1.96 END AS significant_95
       |FROM w""".stripMargin
  }

  // --------------------------------------------------------------- #339
  /** #339 χ² homogeneity drift gate: is the event-type mix of the
    * stream's SECOND half the same distribution as the first? The
    * classic two-sample test a feed monitor runs batch-over-batch
    * before a mixture/curation decision trusts fresh data (#137/#246
    * watch specific signals drift; this is the distribution-level
    * significance test over the categorical mix itself). Window split
    * at the fixed literal day 19738 (2024-01-16 — mid-stream).
    *
    * χ² = Σ_cells (o − e)²/e with e = n_half·c_type/N. Every cell
    * reduces to ONE IEEE division of exact integers: (o·N − n_h·c_t)²
    * accumulates in DECIMAL(38,0) (o·N reaches 2.25·10¹³ at the 100×
    * replica — its square needs 27 digits), the denominator is the
    * explicitly-parenthesized double product (n_h·c_t)·N (3·10²⁰
    * overflows int64 — the double product of exact integers is
    * correctly rounded identically on both engines). Cell terms cross
    * the final sum through sumDec; the α=0.05 verdict compares the
    * UNROUNDED total to 9.488 (df = (2−1)(5−1) = 4). Emits one row
    * per type (half counts + its χ² contribution) with the total/df/
    * verdict alongside — the per-type contributions ARE the read
    * (which type drifted), not just whether.
    *
    * Scale: one map-side-combinable (half, type) count shuffle; the
    * 10-cell frame does windows and the verdict. On this synthetic
    * stream the verdict is (correctly) no-drift; LatticeSpec plants a
    * drifted feed and proves the gate fires.
    */
  def eventsDriftChi2(spark: SparkSession, dir: String): DataFrame =
    driftChi2From(Tables.eventsUs(spark, dir)
      .select(col("event_type"),
        when(expr("ts_us div 86400000000") < 19738L, lit("a"))
          .otherwise(lit("b")).as("half")))

  /** The #339 test over an arbitrary (event_type, half) frame — the
    * spec drives a planted-drift feed through the identical plan.
    */
  private[graft] def driftChi2From(labeled: DataFrame): DataFrame =
    driftChi2FromCells(labeled.groupBy("event_type", "half")
      .agg(count(lit(1)).as("o")))

  /** The #339 algebra from pre-aggregated (event_type, half, o) cells —
    * the streamed twin merges per-batch count partials into exactly
    * this shape (counts are additive and the merge-on-read dedups
    * redelivery, the #262-streamed device), so stream == batch is an
    * identity of the downstream expression tree.
    */
  private[graft] def driftChi2FromCells(cells: DataFrame): DataFrame = {
    val wh = Window.partitionBy("half")
    val wt = Window.partitionBy("event_type")
    val wAll = Window.partitionBy()
    val withM = cells
      .withColumn("nh", sum("o").over(wh))
      .withColumn("ct", sum("o").over(wt))
      .withColumn("nn", sum("o").over(wAll))
    val dnum = (col("o") * col("nn") - col("nh") * col("ct")).cast(dec)
    val term = (dnum * dnum).cast("double") /
      ((col("nh").cast("double") * col("ct").cast("double")) *
        col("nn").cast("double"))
    val perType = withM.groupBy("event_type")
      .agg(sum(when(col("half") === "a", col("o")).otherwise(0L))
          .as("n_a"),
        sum(when(col("half") === "b", col("o")).otherwise(0L)).as("n_b"),
        sum(term.cast(org.apache.spark.sql.types.DecimalType(38, 8)))
          .as("contrib_dec"))
    val total = perType.agg(
      sum("contrib_dec").as("chi2_dec"),
      (count(lit(1)) - 1L).as("df"))
    perType.crossJoin(broadcast(total))
      .select(col("event_type"), col("n_a"), col("n_b"),
        r4(col("contrib_dec").cast("double")).as("contrib"),
        r4(col("chi2_dec").cast("double")).as("chi2"), col("df"),
        when(col("df") === 4L,
          col("chi2_dec").cast("double") > lit(9.488)).as("drift_05"))
      .orderBy("event_type")
  }

  val eventsDriftChi2Sql: String =
    s"""WITH cells AS (
       |  SELECT event_type,
       |    CASE WHEN epoch_us(ts) // 86400000000 < 19738
       |      THEN 'a' ELSE 'b' END AS half,
       |    CAST(COUNT(*) AS BIGINT) AS o
       |  FROM events GROUP BY 1, 2),
       |m AS (
       |  SELECT *,
       |    SUM(o) OVER (PARTITION BY half) AS nh,
       |    SUM(o) OVER (PARTITION BY event_type) AS ct,
       |    SUM(o) OVER () AS nn
       |  FROM cells),
       |t AS (
       |  SELECT *,
       |    CAST(CAST(o * nn - nh * ct AS DECIMAL(38,0))
       |        * CAST(o * nn - nh * ct AS DECIMAL(38,0)) AS DOUBLE)
       |      / ((CAST(nh AS DOUBLE) * CAST(ct AS DOUBLE))
       |        * CAST(nn AS DOUBLE)) AS term
       |  FROM m),
       |pt AS (
       |  SELECT event_type,
       |    CAST(SUM(CASE WHEN half = 'a' THEN o ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(SUM(CASE WHEN half = 'b' THEN o ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    SUM(CAST(term AS DECIMAL(38,8))) AS contrib_dec
       |  FROM t GROUP BY 1),
       |tot AS (
       |  SELECT SUM(contrib_dec) AS chi2_dec,
       |    CAST(COUNT(*) - 1 AS BIGINT) AS df
       |  FROM pt)
       |SELECT event_type, n_a, n_b,
       |  ${r4Sql("CAST(contrib_dec AS DOUBLE)")} AS contrib,
       |  ${r4Sql("CAST(chi2_dec AS DOUBLE)")} AS chi2, df,
       |  CASE WHEN df = 4
       |    THEN CAST(chi2_dec AS DOUBLE) > 9.488 END AS drift_05
       |FROM pt CROSS JOIN tot
       |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- #348
  /** #348 exact PERMUTATION test for the A/B difference in per-user
    * purchase spend — the nonparametric exact-inference leg the kit
    * still lacked: #302/#325 assume normal/binomial sampling
    * distributions, #309 bootstraps the CI, but the textbook answer
    * to "could this split difference be chance?" with NO
    * distributional assumption is to re-randomize the labels and ask
    * where the observed statistic lands in the null ensemble.
    *
    * Unit = user (every user seen in events; spend 0 when no
    * purchase — the #310 unit convention), observed arms = the
    * established `user_id % 2` parity split. Re-randomization r
    * (r = 0..R−1, R = 128) ranks users by md5(user ':' r) (ties by
    * user_id) and labels the first n_a ranks A — EXACT permutations
    * preserving both arm sizes, engine-identical by the md5 device.
    * With arm sizes fixed and the total S fixed, the mean difference
    * is monotone in s_a alone, so the test statistic stays in integer
    * space: t = |s_a·n − S·n_a| (≤ 10¹³ at the 100× replica — int64
    * holds 9.2·10¹⁸). p = (#{t_r ≥ t_obs} + 1)/(R + 1) — the add-one
    * permutation-p convention (the identity permutation is a member
    * of the null ensemble), so p is an EXACT rational emitted as
    * p_num/p_den with r4 only on the final ratio.
    *
    * Scale: ONE pass of the event table (map-side-combinable per-user
    * rollup); the R× expansion is over the USER table only, and each
    * replicate's rank is a per-replicate sort — R bounded partitions
    * of n rows. At extreme user counts the exact test hands over to
    * #302's asymptotics; this operator is the exact-regime answer.
    */
  def statsPermTest(spark: SparkSession, dir: String): DataFrame = {
    val reps = 128
    val u = Tables.eventsUs(spark, dir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", expr(centsExpr))
        .otherwise(0L)).as("c"))
    val obs = u.agg(
      count(lit(1)).as("n"),
      sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
      sum("c").as("s"),
      sum(when(col("user_id") % 2 === 0, col("c")).otherwise(0L))
        .as("s_a"))
    val wr = Window.partitionBy("r").orderBy(col("h"), col("user_id"))
    val perm = u
      .select(col("user_id"), col("c"),
        explode(expr(s"sequence(0, ${reps - 1})")).as("r"))
      .withColumn("h", md5(concat(col("user_id").cast("string"),
        lit(":"), col("r").cast("string"))))
      .withColumn("rk", row_number().over(wr))
      .crossJoin(broadcast(obs))
      .groupBy("r")
      .agg(max("n").as("n"), max("n_a").as("n_a"), max("s").as("s"),
        sum(when(col("rk") <= col("n_a"), col("c")).otherwise(0L))
          .as("s_a_r"))
      .select(col("r"),
        abs(col("s_a_r") * col("n") - col("s") * col("n_a")).as("t_r"))
    val tObs = obs.select(col("n"), col("n_a"),
      (col("n") - col("n_a")).as("n_b"), col("s_a"),
      (col("s") - col("s_a")).as("s_b"),
      abs(col("s_a") * col("n") - col("s") * col("n_a")).as("t_obs"))
    tObs.crossJoin(broadcast(
        perm.crossJoin(broadcast(tObs.select(col("t_obs").as("t0"))))
          .agg(sum(when(col("t_r") >= col("t0"), 1L).otherwise(0L))
            .as("ge"))))
      .select(col("n_a").as("users_a"), col("n_b").as("users_b"),
        col("s_a").as("spend_a_cents"), col("s_b").as("spend_b_cents"),
        col("t_obs"), (col("ge") + 1L).as("p_num"),
        lit(reps + 1L).as("p_den"),
        r4((col("ge") + lit(1.0)) / lit((reps + 1).toDouble)).as("p"))
  }

  val statsPermTestSql: String =
    s"""WITH u AS (
       |  SELECT user_id,
       |    CAST(SUM(CASE WHEN event_type = 'purchase'
       |      THEN $centsSql ELSE 0 END) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |obs AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
       |      AS n_a,
       |    CAST(SUM(c) AS BIGINT) AS s,
       |    CAST(SUM(c) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS s_a
       |  FROM u),
       |perm AS (
       |  SELECT r, user_id, c,
       |    ROW_NUMBER() OVER (PARTITION BY r
       |      ORDER BY md5(user_id || ':' || r), user_id) AS rk
       |  FROM u, unnest(range(0, 128)) AS t(r)),
       |pr AS (
       |  SELECT r,
       |    ABS(CAST(SUM(CASE WHEN rk <= obs.n_a THEN c ELSE 0 END)
       |          AS BIGINT) * obs.n - obs.s * obs.n_a) AS t_r
       |  FROM perm CROSS JOIN obs
       |  GROUP BY r, obs.n, obs.n_a, obs.s),
       |g AS (
       |  -- degenerate-regime alignment (r9 advisory): with zero units
       |  -- the Spark side's sum-over-empty yields NULL ge (a test with
       |  -- no units refuses a verdict), while COUNT FILTER over the
       |  -- empty perm frame would fabricate ge=0 (p = 1/129) — refuse
       |  -- the verdict here too
       |  SELECT CASE WHEN (SELECT n FROM obs) = 0 THEN NULL
       |    ELSE CAST(COUNT(*) FILTER (
       |      WHERE t_r >= ABS(obs.s_a * obs.n - obs.s * obs.n_a))
       |    AS BIGINT) END AS ge
       |  FROM pr CROSS JOIN obs)
       |SELECT CASE WHEN n = 0 THEN NULL ELSE n_a END AS users_a,
       |  CASE WHEN n = 0 THEN NULL ELSE n - n_a END AS users_b,
       |  s_a AS spend_a_cents, s - s_a AS spend_b_cents,
       |  ABS(s_a * n - s * n_a) AS t_obs,
       |  ge + 1 AS p_num, CAST(129 AS BIGINT) AS p_den,
       |  ${r4Sql("(ge + 1.0) / 129.0")} AS p
       |FROM obs CROSS JOIN g""".stripMargin

  // --------------------------------------------------------------- #351
  /** #351 Holm–Bonferroni step-down over the #302 Welch family — the
    * multiple-comparisons correction an experimentation platform runs
    * when it reads ALL the pairwise tests at once: 10 simultaneous
    * t-tests at α=0.05 fabricate ~0.4 expected false positives, and
    * Holm is the uniformly-more-powerful replacement for plain
    * Bonferroni that still controls FWER with NO independence
    * assumption. Pairs rank by UNROUNDED |t| (the #325 discipline —
    * r4 only on emission); rank i tests against the literal critical
    * value z_{α/(2(m−i+1))} (the asymptotic-normal criticals for
    * α/k, k=1..10 — documented literals like #307's 2.3719, both
    * engines parse identical doubles); the step-down verdict is a
    * running AND down the rank order (a MIN window over 10 bounded
    * rows), so one early failure correctly blocks everything after
    * it. Degenerate pairs (n ≤ 1 or zero variance) carry null t and
    * rank last with null verdicts; m counts only TESTED pairs, so
    * the correction never spends α on untestable hypotheses.
    *
    * Scale: one map-side-combinable per-type moment shuffle (5 rows),
    * then windows over the 10-row pair frame — metadata-plane at any
    * event volume.
    */
  /** The #302 Welch pair frame shared by the multiple-comparison
    * corrections (#351 Holm step-down, #355 BH step-up): pairwise Welch
    * t over per-type purchase-cents moments (DECIMAL-exact sums; the
    * ONE IEEE division/sqrt at the end), degenerate pairs (n ≤ 1 or
    * zero variance) carrying null t. One map-side-combinable 5-row
    * moment shuffle at any event volume.
    */
  private def welchPairs(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.eventsUs(spark, dir)
      .select(col("event_type"), expr(centsExpr).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast(dec)).as("s"),
        sum((col("c") * col("c")).cast(dec)).as("q"))
    def se2(p: String): Column = {
      val n = col(s"$p.n")
      val nd = n.cast(dec)
      (nd * col(s"$p.q") - col(s"$p.s") * col(s"$p.s")).cast("double") /
        (nd * n * (n - 1)).cast("double")
    }
    val a = se2("a")
    val b = se2("b")
    val meanDiff = col("a.s").cast("double") / col("a.n").cast("double") -
      col("b.s").cast("double") / col("b.n").cast("double")
    val ok = col("a.n") > 1L && col("b.n") > 1L && (a + b) > 0.0
    broadcast(m.as("a")).join(broadcast(m.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        when(ok, meanDiff / sqrt(a + b)).as("t"))
  }

  /** DuckDB twin of [[welchPairs]]: CTEs `m` (per-type moments), `p`
    * (pairs with Welch t), `mt` (tested-pair count).
    */
  private val welchPairsSqlCtes: String =
    s"""m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(($centsSql)::HUGEINT) AS s,
       |    SUM(($centsSql)::HUGEINT * ($centsSql)) AS q
       |  FROM events GROUP BY 1),
       |p AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    CASE WHEN a.n > 1 AND b.n > 1 AND
       |      CAST(a.n::HUGEINT * a.q - a.s * a.s AS DOUBLE) /
       |        CAST(a.n::HUGEINT * a.n * (a.n - 1) AS DOUBLE) +
       |      CAST(b.n::HUGEINT * b.q - b.s * b.s AS DOUBLE) /
       |        CAST(b.n::HUGEINT * b.n * (b.n - 1) AS DOUBLE) > 0
       |    THEN
       |      (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
       |        - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
       |      / SQRT(
       |        CAST(a.n::HUGEINT * a.q - a.s * a.s AS DOUBLE) /
       |          CAST(a.n::HUGEINT * a.n * (a.n - 1) AS DOUBLE) +
       |        CAST(b.n::HUGEINT * b.q - b.s * b.s AS DOUBLE) /
       |          CAST(b.n::HUGEINT * b.n * (b.n - 1) AS DOUBLE))
       |    END AS t
       |  FROM m a JOIN m b ON a.event_type < b.event_type),
       |mt AS (SELECT CAST(COUNT(t) AS BIGINT) AS m_tested FROM p)"""
      .stripMargin

  def statsHolmAdjust(spark: SparkSession, dir: String): DataFrame = {
    val pairs = welchPairs(spark, dir)
    val mt = pairs.agg(
      sum(when(col("t").isNotNull, 1L).otherwise(0L)).as("m_tested"))
    // z_{α/(2k)} for α=0.05, k=1..10 (asymptotic normal criticals)
    val crits = array(Seq(1.959964, 2.241403, 2.39398, 2.497705,
      2.575829, 2.638257, 2.69011, 2.734369, 2.772921, 2.807034)
      .map(lit): _*)
    val wr = Window.orderBy(col("t").isNull, abs(col("t")).desc,
      col("type_a"), col("type_b"))
    pairs.crossJoin(broadcast(mt))
      .withColumn("rank", row_number().over(wr).cast("long"))
      // fail FAST (r9 advisory): the critical-value table covers
      // m ≤ 10 simultaneous tests (5 event types). A wider family must
      // blow up loudly, not silently null every Holm verdict through
      // an out-of-range element_at
      .withColumn("crit",
        when(col("m_tested") > lit(10L), raise_error(lit(
          "stats_holm_adjust: m_tested > 10 — extend the critical-value"
            + " table")).cast("double"))
        .when(col("t").isNotNull,
          element_at(crits, (col("m_tested") - col("rank") + 1).cast("int"))))
      .withColumn("pass", when(col("t").isNotNull,
        abs(col("t")) > col("crit")))
      .withColumn("holm_sig", when(col("t").isNotNull,
        min(when(col("pass"), 1).otherwise(0))
          .over(wr.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)) === 1))
      .select(col("type_a"), col("type_b"), r4(col("t")).as("t_stat"),
        col("rank"), col("crit"),
        when(col("t").isNotNull, abs(col("t")) > lit(1.959964))
          .as("raw_sig_95"),
        col("holm_sig").as("holm_sig_95"))
      .orderBy("type_a", "type_b")
  }

  val statsHolmAdjustSql: String =
    s"""WITH $welchPairsSqlCtes,
       |r AS (
       |  SELECT p.*, m_tested, CAST(ROW_NUMBER() OVER (
       |    ORDER BY (t IS NULL), ABS(t) DESC, type_a, type_b)
       |    AS BIGINT) AS rank
       |  FROM p CROSS JOIN mt),
       |c AS (
       |  SELECT *, CASE
       |    WHEN m_tested > 10 THEN CAST(error(
       |      'stats_holm_adjust: m_tested > 10 - extend the table')
       |      AS DOUBLE)
       |    WHEN t IS NOT NULL THEN
       |    ([1.959964, 2.241403, 2.39398, 2.497705, 2.575829,
       |      2.638257, 2.69011, 2.734369, 2.772921, 2.807034])
       |      [(m_tested - rank + 1)::INT] END AS crit
       |  FROM r),
       |h AS (SELECT *, CASE WHEN t IS NOT NULL
       |  THEN ABS(t) > crit END AS pass FROM c),
       |f AS (
       |  SELECT *, MIN(CASE WHEN pass THEN 1 ELSE 0 END) OVER (
       |    ORDER BY (t IS NULL), ABS(t) DESC, type_a, type_b
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
       |  FROM h)
       |SELECT type_a, type_b, ${r4Sql("t")} AS t_stat, rank, crit,
       |  CASE WHEN t IS NOT NULL THEN ABS(t) > 1.959964 END
       |    AS raw_sig_95,
       |  CASE WHEN t IS NOT NULL THEN runmin = 1 END AS holm_sig_95
       |FROM f ORDER BY type_a, type_b""".stripMargin

  // --------------------------------------------------------------- #355
  /** #355 Benjamini–Hochberg step-UP over the same #302 Welch family —
    * the FDR-controlling sibling of Holm #351 and the default an
    * experimentation platform reaches for once the metric family grows:
    * Holm controls the family-wise error rate (any false positive),
    * BH controls the expected FALSE-DISCOVERY RATE, which is the right
    * budget when dozens of metrics are read every day and a bounded
    * fraction of false flags is acceptable in exchange for power. BH
    * rejects ranks 1..k* where k* = max{k : p_(k) ≤ α·k/m} — two-sided
    * z form: |t_(k)| ≥ z_{α·k/(2m)} — so the verdict is a running MAX
    * over the CURRENT-AND-FOLLOWING ranks (one early-enough success
    * rescues everything above it; contrast Holm's running AND down the
    * order). BH(α) is uniformly less strict than Holm(α) rank-by-rank
    * (αk/m ≥ α/(m−k+1) for all k ≤ m), so BH's rejection set contains
    * Holm's — LatticeSpec pins that dominance on the live data.
    *
    * Criticals are z_{0.05·k/(2m)} for m = 1..10, k = 1..m — a
    * triangular LITERAL table (generated offline with the stdlib
    * inverse normal, 6 decimals; both engines parse identical doubles —
    * the #307/#351 no-libm discipline), indexed [m_tested][rank], with
    * the same fail-fast guard as #351: a family wider than the table
    * raises, never silently nulls.
    *
    * Scale: identical to #351 — one 5-row moment shuffle, then windows
    * over the ≤10-row pair frame; metadata-plane at any event volume.
    */
  def statsBhAdjust(spark: SparkSession, dir: String): DataFrame = {
    val pairs = welchPairs(spark, dir)
    val mt = pairs.agg(
      sum(when(col("t").isNotNull, 1L).otherwise(0L)).as("m_tested"))
    // z_{0.05·k/(2m)}: row m (1..10), entry k (1..m)
    val critTable: Seq[Seq[Double]] = Seq(
      Seq(1.959964),
      Seq(2.241403, 1.959964),
      Seq(2.39398, 2.128045, 1.959964),
      Seq(2.497705, 2.241403, 2.080278, 1.959964),
      Seq(2.575829, 2.326348, 2.17009, 2.053749, 1.959964),
      Seq(2.638257, 2.39398, 2.241403, 2.128045, 2.036834, 1.959964),
      Seq(2.69011, 2.449998, 2.300347, 2.18935, 2.100165, 2.0251,
        1.959964),
      Seq(2.734369, 2.497705, 2.350464, 2.241403, 2.153875, 2.080278,
        2.016478, 1.959964),
      Seq(2.772921, 2.539185, 2.39398, 2.286548, 2.200411, 2.128045,
        2.065361, 2.009875, 1.959964),
      Seq(2.807034, 2.575829, 2.432379, 2.326348, 2.241403, 2.17009,
        2.108358, 2.053749, 2.004654, 1.959964))
    val crits2 = array(critTable.map(r => array(r.map(lit): _*)): _*)
    val wr = Window.orderBy(col("t").isNull, abs(col("t")).desc,
      col("type_a"), col("type_b"))
    pairs.crossJoin(broadcast(mt))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .withColumn("crit",
        when(col("m_tested") > lit(10L), raise_error(lit(
          "stats_bh_adjust: m_tested > 10 — extend the critical-value"
            + " table")).cast("double"))
        .when(col("t").isNotNull,
          element_at(element_at(crits2, col("m_tested").cast("int")),
            col("rank").cast("int"))))
      .withColumn("pass", when(col("t").isNotNull,
        abs(col("t")) > col("crit")))
      // step-UP: rank k rejects iff ANY rank j >= k passes its
      // threshold (null-t rows sort last and contribute 0)
      .withColumn("bh_sig", when(col("t").isNotNull,
        max(when(col("pass"), 1).otherwise(0))
          .over(wr.rowsBetween(Window.currentRow,
            Window.unboundedFollowing)) === 1))
      .select(col("type_a"), col("type_b"), r4(col("t")).as("t_stat"),
        col("rank"), col("crit"),
        when(col("t").isNotNull, abs(col("t")) > lit(1.959964))
          .as("raw_sig_95"),
        col("bh_sig").as("bh_sig_95"))
      .orderBy("type_a", "type_b")
  }

  val statsBhAdjustSql: String = {
    val tbl = "[[1.959964], [2.241403, 1.959964], " +
      "[2.39398, 2.128045, 1.959964], " +
      "[2.497705, 2.241403, 2.080278, 1.959964], " +
      "[2.575829, 2.326348, 2.17009, 2.053749, 1.959964], " +
      "[2.638257, 2.39398, 2.241403, 2.128045, 2.036834, 1.959964], " +
      "[2.69011, 2.449998, 2.300347, 2.18935, 2.100165, 2.0251, " +
      "1.959964], " +
      "[2.734369, 2.497705, 2.350464, 2.241403, 2.153875, 2.080278, " +
      "2.016478, 1.959964], " +
      "[2.772921, 2.539185, 2.39398, 2.286548, 2.200411, 2.128045, " +
      "2.065361, 2.009875, 1.959964], " +
      "[2.807034, 2.575829, 2.432379, 2.326348, 2.241403, 2.17009, " +
      "2.108358, 2.053749, 2.004654, 1.959964]]"
    s"""WITH $welchPairsSqlCtes,
       |r AS (
       |  SELECT p.*, m_tested, CAST(ROW_NUMBER() OVER (
       |    ORDER BY (t IS NULL), ABS(t) DESC, type_a, type_b)
       |    AS BIGINT) AS rank
       |  FROM p CROSS JOIN mt),
       |c AS (
       |  SELECT *, CASE
       |    WHEN m_tested > 10 THEN CAST(error(
       |      'stats_bh_adjust: m_tested > 10 - extend the table')
       |      AS DOUBLE)
       |    WHEN t IS NOT NULL THEN
       |    ($tbl)[m_tested::INT][rank::INT] END AS crit
       |  FROM r),
       |h AS (SELECT *, CASE WHEN t IS NOT NULL
       |  THEN ABS(t) > crit END AS pass FROM c),
       |f AS (
       |  SELECT *, MAX(CASE WHEN pass THEN 1 ELSE 0 END) OVER (
       |    ORDER BY (t IS NULL), ABS(t) DESC, type_a, type_b
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS runmax
       |  FROM h)
       |SELECT type_a, type_b, ${r4Sql("t")} AS t_stat, rank, crit,
       |  CASE WHEN t IS NOT NULL THEN ABS(t) > 1.959964 END
       |    AS raw_sig_95,
       |  CASE WHEN t IS NOT NULL THEN runmax = 1 END AS bh_sig_95
       |FROM f ORDER BY type_a, type_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_bh_adjust" -> (statsBhAdjust _),
    "stats_holm_adjust" -> (statsHolmAdjust _),
    "stats_perm_test" -> (statsPermTest _),
    "events_drift_chi2" -> (eventsDriftChi2 _),
    "stats_two_proportion" -> (statsTwoProportion _),
    "stats_anova" -> (statsAnova _),
    "stats_power_mde" -> (statsPowerMde _),
    "stats_bootstrap_ci" -> (statsBootstrapCi _),
    "events_cuped" -> (eventsCuped _),
    "quality_fleiss_kappa" -> (qualityFleissKappa _),
    "ts_seasonal_strength" -> (tsSeasonalStrength _),
    "stats_ols_2var" -> (statsOls2var _))

  val oracles: Map[String, String] = Map(
    "stats_bh_adjust" -> statsBhAdjustSql,
    "stats_holm_adjust" -> statsHolmAdjustSql,
    "stats_perm_test" -> statsPermTestSql,
    "events_drift_chi2" -> eventsDriftChi2Sql,
    "stats_two_proportion" -> statsTwoProportionSql,
    "stats_anova" -> statsAnovaSql,
    "stats_power_mde" -> statsPowerMdeSql,
    "stats_bootstrap_ci" -> statsBootstrapCiSql,
    "events_cuped" -> eventsCupedSql,
    "quality_fleiss_kappa" -> qualityFleissKappaSql,
    "ts_seasonal_strength" -> tsSeasonalStrengthSql,
    "stats_ols_2var" -> statsOls2varSql)
}
