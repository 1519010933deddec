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

  // --------------------------------------------------------------- #323
  /** #323 t-closeness audit — the third leg of the privacy triad
    * (k-anonymity catches small cells, l-diversity catches homogeneous
    * cells, t-closeness catches cells whose sensitive DISTRIBUTION
    * diverges from the global one: an attacker learns "this cell skews
    * URGENT" even when l ≥ 2). Sensitive attribute = the #315
    * first-order priority, an ORDERED category (its leading digit is
    * the ordinal), so the right distance is the ordered-category Earth
    * Mover's Distance of the original paper (Li/Li/Venkatasubramanian
    * 2007): EMD = Σᵢ |CumP(i) − CumQ(i)| / (m−1) over the m global
    * values.
    *
    * Exactness: the EMD is computed entirely in INTEGER space —
    * cum_cell(i)·N − cum_global(i)·n per ordinal, absolute-summed, and
    * divided ONCE (r4'd) by n·N·(m−1); degenerate cells (no carriers)
    * and a degenerate domain (m < 2) gate to null on both engines.
    *
    * Scale: one key-partitioned first-order window (the #315 shape),
    * one grouped shuffle to (cell, value) counts, then everything is
    * DOMAIN-sized: cells × m rows for the cumulative walk (a broadcast
    * cross join of two bounded dims). The audit output is cell-table
    * sized at any corpus scale.
    */
  def privacyTCloseness(spark: SparkSession, dir: String): DataFrame = {
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
    val carriers = qi(spark, dir)
      .join(firstOrder, Seq("c_custkey"))
      .select(col("nation"), col("segment"), col("bal_band"),
        col("sensitive"))
    // global ordered value domain with cumulative counts (m rows)
    val wv = Window.orderBy("sensitive") // m-row domain walk — bounded
    val globals = carriers.groupBy("sensitive")
      .agg(count(lit(1)).as("g"))
      .withColumn("ord", row_number().over(wv))
      .withColumn("cum_g", sum("g").over(
        wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = globals.agg(sum("g").as("big_n"),
      count(lit(1)).as("m"))
    val cells = carriers.groupBy("nation", "segment", "bal_band")
      .agg(count(lit(1)).as("n_sensitive"))
    val cellCounts = carriers
      .groupBy("nation", "segment", "bal_band", "sensitive")
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy("nation", "segment", "bal_band")
      .orderBy("ord")
    val walk = cells
      .crossJoin(broadcast(globals.select("sensitive", "ord", "cum_g")))
      .join(cellCounts, Seq("nation", "segment", "bal_band", "sensitive"),
        "left")
      .na.fill(0L, Seq("c"))
      .withColumn("cum_c", sum("c").over(
        wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val emd = walk
      .crossJoin(broadcast(totals))
      .where(col("ord") < col("m")) // the m-th cumulative is always equal
      .groupBy(col("nation"), col("segment"), col("bal_band"),
        col("n_sensitive"), col("big_n"), col("m"))
      .agg(sum(abs(col("cum_c") * col("big_n") -
        col("cum_g") * col("n_sensitive"))).as("terms"))
      .select(col("nation"), col("segment"), col("bal_band"),
        col("n_sensitive"),
        when(col("m") >= 2L, r4(col("terms").cast("double") /
          (col("n_sensitive").cast("double") * col("big_n").cast("double")
            * (col("m") - 1L).cast("double")))).as("emd"))
    qi(spark, dir)
      .groupBy("nation", "segment", "bal_band")
      .agg(count(lit(1)).as("n"))
      .join(emd, Seq("nation", "segment", "bal_band"), "left")
      .select(col("nation"), col("segment"), col("bal_band"), col("n"),
        coalesce(col("n_sensitive"), lit(0L)).as("n_sensitive"),
        col("emd"),
        coalesce(col("emd") > 0.2, lit(false)).as("t_violation"))
      .orderBy("nation", "segment", "bal_band")
  }

  val privacyTClosenessSql: String =
    s"""WITH q AS (
       |  $qiSql),
       |fo AS (
       |  SELECT o_custkey AS c_custkey, o_orderpriority AS sensitive
       |  FROM (
       |    SELECT o_custkey, o_orderpriority, ROW_NUMBER() OVER (
       |      PARTITION BY o_custkey
       |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
       |    FROM orders)
       |  WHERE rn = 1),
       |carriers AS (
       |  SELECT nation, segment, bal_band, sensitive
       |  FROM q JOIN fo USING (c_custkey)),
       |globals AS (
       |  SELECT sensitive, CAST(COUNT(*) AS BIGINT) AS g,
       |    ROW_NUMBER() OVER (ORDER BY sensitive) AS ord,
       |    CAST(SUM(COUNT(*)) OVER (ORDER BY sensitive
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_g
       |  FROM carriers GROUP BY sensitive),
       |tot AS (
       |  SELECT CAST(SUM(g) AS BIGINT) AS big_n,
       |    CAST(COUNT(*) AS BIGINT) AS m FROM globals),
       |cells AS (
       |  SELECT nation, segment, bal_band,
       |    CAST(COUNT(*) AS BIGINT) AS n_sensitive
       |  FROM carriers GROUP BY 1, 2, 3),
       |cc AS (
       |  SELECT nation, segment, bal_band, sensitive,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM carriers GROUP BY 1, 2, 3, 4),
       |walk AS (
       |  SELECT cells.nation, cells.segment, cells.bal_band,
       |    cells.n_sensitive, globals.ord, globals.cum_g,
       |    CAST(SUM(COALESCE(cc.c, 0)) OVER (PARTITION BY cells.nation,
       |      cells.segment, cells.bal_band ORDER BY globals.ord
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
       |  FROM cells CROSS JOIN globals
       |    LEFT JOIN cc ON cc.nation = cells.nation
       |      AND cc.segment = cells.segment
       |      AND cc.bal_band = cells.bal_band
       |      AND cc.sensitive = globals.sensitive),
       |emd AS (
       |  SELECT nation, segment, bal_band, n_sensitive,
       |    CASE WHEN m >= 2 THEN
       |      ${r4Sql("CAST(SUM(ABS(cum_c * big_n - cum_g * n_sensitive))" +
                      " AS DOUBLE) / (CAST(n_sensitive AS DOUBLE) " +
                      "* CAST(big_n AS DOUBLE) * CAST(m - 1 AS DOUBLE))")}
       |      END AS emd
       |  FROM walk CROSS JOIN tot
       |  WHERE ord < m
       |  GROUP BY nation, segment, bal_band, n_sensitive, big_n, m)
       |SELECT q2.nation, q2.segment, q2.bal_band, q2.n,
       |  COALESCE(emd.n_sensitive, 0) AS n_sensitive, emd.emd,
       |  COALESCE(emd.emd > 0.2, FALSE) AS t_violation
       |FROM (
       |  SELECT nation, segment, bal_band,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM q GROUP BY 1, 2, 3) q2
       |  LEFT JOIN emd ON q2.nation = emd.nation
       |    AND q2.segment = emd.segment AND q2.bal_band = emd.bal_band
       |ORDER BY q2.nation, q2.segment, q2.bal_band""".stripMargin

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

  /** The ER family's master projection (shared by #319/#321). */
  private def erMaster(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .select(col("c_custkey").as("ck"), col("c_name").as("nm"),
        col("c_nationkey").cast("long").as("nat"),
        col("c_mktsegment").as("seg"),
        expr("cast(floor(c_acctbal * 100.0 + 0.5) as bigint)").as("bal"))

  /** Block purging (the ER scale guard): drop master records whose
    * (segment, name-digits-1-8) block exceeds 256 members BEFORE the
    * candidate join. A degenerate blocking key must cost recall on its
    * collisions, never a quadratic join — the measured lesson of the
    * round-19 100× probe (59 GB spill from K×-fattened blocks before
    * the cap). No-op on sane distributions; one master-side window.
    */
  private def purgedMaster(master: DataFrame): DataFrame = {
    val wb = Window.partitionBy(col("seg"),
      expr("substring(nm, 10, 8)"))
    master.withColumn("_bn", count(lit(1)).over(wb))
      .where(col("_bn") <= 256L)
      .drop("_bn")
  }

  private val purgedMasterSql: String =
    """SELECT ck, nm, nat, seg, bal FROM (
      |    SELECT *, COUNT(*) OVER (PARTITION BY seg, substr(nm, 10, 8))
      |      AS bn
      |    FROM clean)
      |  WHERE bn <= 256""".stripMargin

  // --------------------------------------------------------------- #319
  /** #319 fuzzy entity resolution with blocking: link a planted DIRTY
    * re-registration feed back to the customer master — the two-table
    * record-linkage read (dedup's cross-source sibling, the other
    * half of a data custodian's identity work). The feed perturbs
    * every third customer deterministically (name truncated for even
    * keys, balance bumped $1 for key%7, nation shifted for key%5), so
    * ground truth is planted and precision/recall are EXACT, not
    * sampled.
    *
    * Blocking: (segment, id digits 1-8 of the name) — the MAXIMAL
    * perturbation-proof key (truncation only removes digit 9; nation
    * isn't in the key), round-19-widened from digits 4-8 after the
    * 100× probe measured the narrower key's ceiling: a k-digit block
    * key has FIXED cardinality, so blocks must fatten linearly once
    * the corpus outgrows 10^k cells (pigeonhole — 59 GB of join spill
    * at the 100× replica). Digits 1-8 cut blocks to ~one key-decade
    * (≈10 ids) at ANY corpus size; at bench scales digits 1-3 are
    * zero padding, so results are bit-identical to the old key. (The
    * round-7 lesson still stands the other way: blocking on the
    * LEADING digits alone degenerated to segment-sized cells.) The
    * emitted block_recall measures the survival property. Scoring:
    * Levenshtein ≤ 1 on names (+2, the #98 parity device), balance
    * within $1 (+1), nation equal (+1); resolve each dirty record to
    * its best candidate (score desc, lowest key) and accept at
    * score ≥ 3.
    *
    * Scale: the blocked equi-join shuffles on a HIGH-CARDINALITY key
    * (id-digit prefixes — block sizes stay bounded as the corpus
    * grows, never nation/segment-sized quadratic cells), and BLOCK
    * PURGING (round 19) hard-caps the worst case: blocks holding more
    * than 256 master records are dropped before the join — the
    * standard ER discipline (a degenerate blocking key must cost
    * recall on its collisions, never a quadratic join; the 100×
    * replica probe measured exactly that blowup, 59 GB of spill,
    * before the cap — PLANS.md round-19). The cap is a no-op on sane
    * key distributions (blocks here are ≤ ~10 at every sf).
    * Resolution is one window per dirty id. All counts integer; P/R
    * are r4'd ratios of exact integers.
    */
  def erFuzzyLink(spark: SparkSession, dir: String): DataFrame = {
    val clean = erMaster(spark, dir)
    val cleanB = purgedMaster(clean)
    val dirty = clean.where(col("ck") % 3 === 0)
      .select((col("ck") + lit(1000000000000L)).as("did"),
        col("ck").as("truth"),
        when(col("ck") % 2 === 0,
          expr("substring(nm, 1, length(nm) - 1)")).otherwise(col("nm"))
          .as("dnm"),
        when(col("ck") % 5 === 0, (col("nat") + 1) % 25)
          .otherwise(col("nat")).as("dnat"),
        col("seg").as("dseg"),
        (col("bal") + when(col("ck") % 7 === 0, 100L).otherwise(0L))
          .as("dbal"))
    val cand = dirty.join(cleanB,
      col("dseg") === col("seg") &&
        expr("substring(dnm, 10, 8)") === expr("substring(nm, 10, 8)"))
    val scored = cand.select(col("did"), col("truth"), col("ck"),
      (when(expr("levenshtein(dnm, nm)") <= 1, 2L).otherwise(0L) +
        when(abs(col("dbal") - col("bal")) <= 100L, 1L).otherwise(0L) +
        when(col("dnat") === col("nat"), 1L).otherwise(0L)).as("score"))
    val wd = Window.partitionBy("did")
      .orderBy(desc("score"), col("ck"))
    val resolved = scored.withColumn("rn", row_number().over(wd))
      .where(col("rn") === 1 && col("score") >= 3L)
    val res = resolved.agg(count(lit(1)).as("n_resolved"),
      sum(when(col("ck") === col("truth"), 1L).otherwise(0L))
        .as("n_correct"))
    val blockRecall = cand.where(col("ck") === col("truth"))
      .agg(countDistinct("did").as("n_blocked_truth"))
    val nd = dirty.agg(count(lit(1)).as("n_dirty"))
    val nc = cand.agg(count(lit(1)).as("n_candidates"))
    broadcast(nd).crossJoin(broadcast(nc))
      .crossJoin(broadcast(res)).crossJoin(broadcast(blockRecall))
      .select(col("n_dirty"), col("n_candidates"), col("n_resolved"),
        col("n_correct"),
        when(col("n_resolved") > 0L,
          r4(col("n_correct").cast("double") /
            col("n_resolved").cast("double"))).as("precision"),
        when(col("n_dirty") > 0L,
          r4(col("n_correct").cast("double") /
            col("n_dirty").cast("double"))).as("recall"),
        when(col("n_dirty") > 0L,
          r4(col("n_blocked_truth").cast("double") /
            col("n_dirty").cast("double"))).as("block_recall"))
  }

  val erFuzzyLinkSql: String =
    s"""WITH clean AS (
       |  SELECT c_custkey AS ck, c_name AS nm,
       |    CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
       |    CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal
       |  FROM customer),
       |dirty AS (
       |  SELECT ck + 1000000000000 AS did, ck AS truth,
       |    CASE WHEN ck % 2 = 0 THEN substr(nm, 1, length(nm) - 1)
       |      ELSE nm END AS dnm,
       |    CASE WHEN ck % 5 = 0 THEN (nat + 1) % 25 ELSE nat END AS dnat,
       |    seg AS dseg,
       |    bal + CASE WHEN ck % 7 = 0 THEN 100 ELSE 0 END AS dbal
       |  FROM clean WHERE ck % 3 = 0),
       |cleanp AS (
       |  $purgedMasterSql),
       |cand AS (
       |  SELECT d.did, d.truth, c.ck,
       |    CASE WHEN levenshtein(d.dnm, c.nm) <= 1 THEN 2 ELSE 0 END
       |      + CASE WHEN ABS(d.dbal - c.bal) <= 100 THEN 1 ELSE 0 END
       |      + CASE WHEN d.dnat = c.nat THEN 1 ELSE 0 END AS score
       |  FROM dirty d JOIN cleanp c ON d.dseg = c.seg
       |    AND substr(d.dnm, 10, 8) = substr(c.nm, 10, 8)),
       |resolved AS (
       |  SELECT did, truth, ck, score FROM (
       |    SELECT did, truth, ck, score, ROW_NUMBER() OVER (
       |      PARTITION BY did ORDER BY score DESC, ck) AS rn
       |    FROM cand)
       |  WHERE rn = 1 AND score >= 3),
       |res AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_resolved,
       |    CAST(COUNT(*) FILTER (WHERE ck = truth) AS BIGINT)
       |      AS n_correct
       |  FROM resolved),
       |br AS (
       |  SELECT CAST(COUNT(DISTINCT did) AS BIGINT) AS n_blocked_truth
       |  FROM cand WHERE ck = truth),
       |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dirty FROM dirty),
       |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand)
       |SELECT n_dirty, n_candidates, n_resolved, n_correct,
       |  CASE WHEN n_resolved > 0 THEN
       |    ${r4Sql("CAST(n_correct AS DOUBLE) / " +
                    "CAST(n_resolved AS DOUBLE)")} END AS precision,
       |  CASE WHEN n_dirty > 0 THEN
       |    ${r4Sql("CAST(n_correct AS DOUBLE) / CAST(n_dirty AS DOUBLE)")}
       |    END AS recall,
       |  CASE WHEN n_dirty > 0 THEN
       |    ${r4Sql("CAST(n_blocked_truth AS DOUBLE) / " +
                    "CAST(n_dirty AS DOUBLE)")} END AS block_recall
       |FROM nd, nc, res, br""".stripMargin

  // --------------------------------------------------------------- #321
  /** #321 entity-resolution clusters + golden-record survivorship —
    * the multi-source graduate of #319: TWO dirty re-registration
    * feeds (feed A = #319's perturbations at +10¹², feed B = a second
    * registration wave at +2·10¹² with its own deterministic
    * perturbations: name truncated for key%8, nation +2 for key%13,
    * balance +75¢ for key%11) each link to the customer master
    * through the same blocking + scoring; accepted links form
    * identity CLUSTERS (connected components — every accepted link
    * touches its master record, so the component label is the master
    * key, the #41/#152 min-label device degenerated to one hop by
    * construction), and customers in BOTH feeds (key%12) collapse
    * transitively into one 3-member cluster. Per cluster a GOLDEN
    * record survives by per-field policy: name = most COMPLETE
    * (longest, tie → lexicographic min — truncated re-registrations
    * lose), nation and balance = MAJORITY vote with ties broken by
    * min (the master recovers a 1-1 balance tie because bumps are
    * positive; a nation tie can mispick when the shifted value wraps
    * below — deliberately kept, because that is what majority-vote
    * survivorship really does, and the emitted *_correct flags
    * measure it against the planted truth exactly).
    *
    * Scale: the blocked join is #319's high-cardinality shape; the
    * member table is link-sized; golden selection is three
    * cluster-partitioned windows over ≤3-member groups. Everything
    * emitted is integers/strings/booleans — bit-exact cross-engine.
    */
  def erGoldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val clean = erMaster(spark, dir)
    val cleanB = purgedMaster(clean) // the #319 block-purge scale guard
    def feed(modK: Int, idBase: Long, src: String, truncK: Int,
        natK: Int, natShift: Int, balK: Int, balBump: Long) =
      clean.where(col("ck") % modK === 0)
        .select((col("ck") + lit(idBase)).as("did"),
          col("ck").as("truth"), lit(src).as("src"),
          when(col("ck") % truncK === 0,
            expr("substring(nm, 1, length(nm) - 1)")).otherwise(col("nm"))
            .as("dnm"),
          when(col("ck") % natK === 0, (col("nat") + natShift) % 25)
            .otherwise(col("nat")).as("dnat"),
          col("seg").as("dseg"),
          (col("bal") + when(col("ck") % balK === 0, balBump)
            .otherwise(0L)).as("dbal"))
    val feeds = feed(3, 1000000000000L, "feedA", 2, 5, 1, 7, 100L)
      .unionByName(feed(4, 2000000000000L, "feedB", 8, 13, 2, 11, 75L))
    val cand = feeds.join(cleanB,
      col("dseg") === col("seg") &&
        expr("substring(dnm, 10, 8)") === expr("substring(nm, 10, 8)"))
    val wd = Window.partitionBy("did")
      .orderBy(desc("score"), col("ck"))
    val resolved = cand.select(col("did"), col("truth"), col("src"),
        col("ck"), col("dnm"), col("dnat"), col("dbal"),
        (when(expr("levenshtein(dnm, nm)") <= 1, 2L).otherwise(0L) +
          when(abs(col("dbal") - col("bal")) <= 100L, 1L).otherwise(0L) +
          when(col("dnat") === col("nat"), 1L).otherwise(0L)).as("score"))
      .withColumn("rn", row_number().over(wd))
      .where(col("rn") === 1 && col("score") >= 3L)
    val members = resolved
      .select(col("ck").as("cluster"), col("src"), col("dnm").as("name"),
        col("dnat").as("nation"), col("dbal").as("balc"), col("truth"))
      .unionByName(
        clean.join(resolved.select(col("ck").as("cluster")).distinct(),
            col("ck") === col("cluster"))
          .select(col("cluster"), lit("master").as("src"),
            col("nm").as("name"), col("nat").as("nation"),
            col("bal").as("balc"), col("ck").as("truth")))
    val goldenName = members
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster")
          .orderBy(length(col("name")).desc, col("name"))))
      .where(col("rn") === 1)
      .select(col("cluster"), col("name").as("golden_name"))
    def modal(field: String, out: String) = members
      .groupBy(col("cluster"), col(field))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster")
          .orderBy(desc("cnt"), col(field))))
      .where(col("rn") === 1)
      .select(col("cluster"), col(field).as(out))
    val stats = members.groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        countDistinct("src").as("n_sources"),
        sum(when(col("truth") === col("cluster"), 1L).otherwise(0L))
          .as("n_correct"))
    stats
      .join(goldenName, "cluster")
      .join(modal("nation", "golden_nation"), "cluster")
      .join(modal("balc", "golden_bal_cents"), "cluster")
      .join(clean.select(col("ck").as("cluster"), col("nm").as("tnm"),
        col("nat").as("tnat"), col("bal").as("tbal")), "cluster")
      .select(col("cluster").as("cluster_ck"), col("n_members"),
        col("n_sources"), col("n_correct"), col("golden_name"),
        col("golden_nation"), col("golden_bal_cents"),
        (col("golden_name") === col("tnm")).as("name_correct"),
        (col("golden_nation") === col("tnat")).as("nation_correct"),
        (col("golden_bal_cents") === col("tbal")).as("bal_correct"))
      .orderBy("cluster_ck")
  }

  val erGoldenRecordSql: String =
    s"""WITH clean AS (
      |  SELECT c_custkey AS ck, c_name AS nm,
      |    CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
      |    CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal
      |  FROM customer),
      |feeds AS (
      |  SELECT ck + 1000000000000 AS did, ck AS truth, 'feedA' AS src,
      |    CASE WHEN ck % 2 = 0 THEN substr(nm, 1, length(nm) - 1)
      |      ELSE nm END AS dnm,
      |    CASE WHEN ck % 5 = 0 THEN (nat + 1) % 25 ELSE nat END AS dnat,
      |    seg AS dseg,
      |    bal + CASE WHEN ck % 7 = 0 THEN 100 ELSE 0 END AS dbal
      |  FROM clean WHERE ck % 3 = 0
      |  UNION ALL
      |  SELECT ck + 2000000000000, ck, 'feedB',
      |    CASE WHEN ck % 8 = 0 THEN substr(nm, 1, length(nm) - 1)
      |      ELSE nm END,
      |    CASE WHEN ck % 13 = 0 THEN (nat + 2) % 25 ELSE nat END,
      |    seg,
      |    bal + CASE WHEN ck % 11 = 0 THEN 75 ELSE 0 END
      |  FROM clean WHERE ck % 4 = 0),
      |cleanp AS (
      |  $purgedMasterSql),
      |resolved AS (
      |  SELECT did, truth, src, ck, dnm, dnat, dbal FROM (
      |    SELECT f.did, f.truth, f.src, c.ck, f.dnm, f.dnat, f.dbal,
      |      CASE WHEN levenshtein(f.dnm, c.nm) <= 1 THEN 2 ELSE 0 END
      |        + CASE WHEN ABS(f.dbal - c.bal) <= 100 THEN 1 ELSE 0 END
      |        + CASE WHEN f.dnat = c.nat THEN 1 ELSE 0 END AS score,
      |      ROW_NUMBER() OVER (PARTITION BY f.did ORDER BY
      |        CASE WHEN levenshtein(f.dnm, c.nm) <= 1 THEN 2 ELSE 0 END
      |        + CASE WHEN ABS(f.dbal - c.bal) <= 100 THEN 1 ELSE 0 END
      |        + CASE WHEN f.dnat = c.nat THEN 1 ELSE 0 END DESC,
      |        c.ck) AS rn
      |    FROM feeds f JOIN cleanp c ON f.dseg = c.seg
      |      AND substr(f.dnm, 10, 8) = substr(c.nm, 10, 8))
      |  WHERE rn = 1 AND score >= 3),
      |members AS (
      |  SELECT ck AS cluster, src, dnm AS name, dnat AS nation,
      |    dbal AS balc, truth
      |  FROM resolved
      |  UNION ALL
      |  SELECT c.ck, 'master', c.nm, c.nat, c.bal, c.ck
      |  FROM clean c JOIN (SELECT DISTINCT ck FROM resolved) r
      |    ON c.ck = r.ck),
      |gname AS (
      |  SELECT cluster, name AS golden_name FROM (
      |    SELECT cluster, name, ROW_NUMBER() OVER (PARTITION BY cluster
      |      ORDER BY length(name) DESC, name) AS rn
      |    FROM members) WHERE rn = 1),
      |gnat AS (
      |  SELECT cluster, nation AS golden_nation FROM (
      |    SELECT cluster, nation, ROW_NUMBER() OVER (PARTITION BY
      |      cluster ORDER BY COUNT(*) DESC, nation) AS rn
      |    FROM members GROUP BY cluster, nation) WHERE rn = 1),
      |gbal AS (
      |  SELECT cluster, balc AS golden_bal_cents FROM (
      |    SELECT cluster, balc, ROW_NUMBER() OVER (PARTITION BY
      |      cluster ORDER BY COUNT(*) DESC, balc) AS rn
      |    FROM members GROUP BY cluster, balc) WHERE rn = 1),
      |stats AS (
      |  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
      |    CAST(COUNT(DISTINCT src) AS BIGINT) AS n_sources,
      |    CAST(COUNT(*) FILTER (WHERE truth = cluster) AS BIGINT)
      |      AS n_correct
      |  FROM members GROUP BY cluster)
      |SELECT s.cluster AS cluster_ck, s.n_members, s.n_sources,
      |  s.n_correct, gname.golden_name, gnat.golden_nation,
      |  gbal.golden_bal_cents,
      |  gname.golden_name = c.nm AS name_correct,
      |  gnat.golden_nation = c.nat AS nation_correct,
      |  gbal.golden_bal_cents = c.bal AS bal_correct
      |FROM stats s
      |  JOIN gname ON s.cluster = gname.cluster
      |  JOIN gnat ON s.cluster = gnat.cluster
      |  JOIN gbal ON s.cluster = gbal.cluster
      |  JOIN clean c ON s.cluster = c.ck
      |ORDER BY cluster_ck""".stripMargin

  // --------------------------------------------------------------- #338
  /** The five candidate blocking keys #338 scores, as (name, dirty-side
    * SQL expr, master-side SQL expr) — every key rendered to a STRING
    * so one long-format union covers them all. The lineup spans the
    * design space a real ER build walks:
    *   - `a_seg_only`       coarse natural key: full recall, block =
    *                        whole segment (the quadratic trap);
    *   - `b_bal_dollar`     attribute-derived key that the planted
    *                        balance bump perturbs across its boundary
    *                        (recall loss on exactly the key%7 records);
    *   - `c_digits_2_9`     positional key overlapping the TRUNCATED
    *                        digit: every even-key (truncated) feed row
    *                        blocks apart from its master;
    *   - `d_seg_digits_4_8` the round-7..18 production key — full
    *                        recall, but FIXED 10⁵-cell cardinality
    *                        (the pigeonhole ceiling the 100× probe
    *                        measured);
    *   - `e_seg_digits_1_8` the current production key (~one
    *                        key-decade per block at any scale).
    * Dollar banding uses floor(cents / 100.0) — IEEE division + floor,
    * identical on both engines (integer `div`/`//` disagree on
    * NEGATIVE balances: Spark truncates toward zero, DuckDB floors).
    */
  private val blockingKeys: Seq[(String, String, String)] = Seq(
    ("a_seg_only", "dseg", "seg"),
    ("b_bal_dollar",
      "cast(cast(floor(cast(dbal as double) / 100.0) as bigint) as string)",
      "cast(cast(floor(cast(bal as double) / 100.0) as bigint) as string)"),
    ("c_digits_2_9", "substring(dnm, 11, 8)", "substring(nm, 11, 8)"),
    ("d_seg_digits_4_8", "concat(dseg, substring(dnm, 13, 5))",
      "concat(seg, substring(nm, 13, 5))"),
    ("e_seg_digits_1_8", "concat(dseg, substring(dnm, 10, 8))",
      "concat(seg, substring(nm, 10, 8))"))

  /** #338 blocking-key design evaluation — the decision the 100×
    * probe forced on #319 (PLANS.md round-19), turned into an
    * operator: score candidate blocking keys on the planted ER truth
    * BEFORE committing the candidate join to one. Per key:
    * `n_truth` / `n_hit` / `recall` (exact — the planted feed gives
    * every dirty record a known master, and a truth pair survives
    * blocking iff both sides render the same key, checked on the 1:1
    * truth join), `n_candidates` = Σ_b |feed_b|·|master_b| (the
    * comparison mass the scorer would pay, computed from GROUP COUNTS
    * joined on the key — never by materializing the candidate join,
    * so a degenerate key costs a multiplication here instead of a
    * 59 GB spill), and `max_block_masters` (the skew ceiling purge
    * would clip). The eval is the ER analogue of #188's
    * dedup-threshold sweep: recall alone never picks the key —
    * `a_seg_only` recalls 1.0 at ~10⁵× the comparison mass of
    * `e_seg_digits_1_8`, and the two positional keys split exactly on
    * whether they overlap the perturbed digit.
    *
    * Scale: three key-cardinality-sized aggregates and one linear 1:1
    * join; nothing here grows faster than the corpus at any key
    * degeneracy — that is the operator's own design point.
    */
  def erBlockingEval(spark: SparkSession, dir: String): DataFrame = {
    val clean = erMaster(spark, dir)
    val dirty = clean.where(col("ck") % 3 === 0)
      .select(col("ck").as("truth"),
        when(col("ck") % 2 === 0,
          expr("substring(nm, 1, length(nm) - 1)")).otherwise(col("nm"))
          .as("dnm"),
        col("seg").as("dseg"),
        (col("bal") + when(col("ck") % 7 === 0, 100L).otherwise(0L))
          .as("dbal"))
    def longForm(df: DataFrame, exprs: Seq[(String, String)]): DataFrame =
      df.select(expr("stack(" + exprs.size + ", " + exprs.map {
        case (n, e) => s"'$n', $e"
      }.mkString(", ") + ") as (key_name, k)"))
    val mLong = longForm(clean, blockingKeys.map { case (n, _, m) => (n, m) })
    val dLong = longForm(dirty, blockingKeys.map { case (n, d, _) => (n, d) })
    val mc = mLong.groupBy("key_name", "k").agg(count(lit(1)).as("nm"))
    val dc = dLong.groupBy("key_name", "k").agg(count(lit(1)).as("nd"))
    val cand = mc.join(dc, Seq("key_name", "k"))
      .groupBy("key_name")
      .agg(sum(col("nm") * col("nd")).as("n_candidates"))
    val maxB = mc.groupBy("key_name")
      .agg(max(col("nm")).as("max_block_masters"))
    val hits = dirty.join(clean, col("truth") === col("ck"))
      .select(expr("stack(" + blockingKeys.size + ", " + blockingKeys.map {
        case (n, d, m) =>
          s"'$n', cast(($d) = ($m) as long)"
      }.mkString(", ") + ") as (key_name, hit)"))
      .groupBy("key_name")
      .agg(count(lit(1)).as("n_truth"), sum("hit").as("n_hit"))
    hits.join(cand, "key_name").join(maxB, "key_name")
      .select(col("key_name"), col("n_truth"), col("n_hit"),
        r4(col("n_hit").cast("double") / col("n_truth").cast("double"))
          .as("recall"),
        col("n_candidates"), col("max_block_masters"))
      .orderBy("key_name")
  }

  val erBlockingEvalSql: String = {
    def dk(e: String) = e
      .replace("substring(", "substr(")
      .replace("cast(floor(cast(dbal as double) / 100.0) as bigint)",
        "CAST(FLOOR(CAST(dbal AS DOUBLE) / 100.0) AS BIGINT)")
      .replace("cast(floor(cast(bal as double) / 100.0) as bigint)",
        "CAST(FLOOR(CAST(bal AS DOUBLE) / 100.0) AS BIGINT)")
      .replace("cast(", "CAST(").replace(" as string)", " AS VARCHAR)")
    val mUnion = blockingKeys.map { case (n, _, m) =>
      s"SELECT '$n' AS key_name, ${dk(m)} AS k FROM clean"
    }.mkString("\n  UNION ALL ")
    val dUnion = blockingKeys.map { case (n, d, _) =>
      s"SELECT '$n' AS key_name, ${dk(d)} AS k FROM dirty"
    }.mkString("\n  UNION ALL ")
    val hitCases = blockingKeys.map { case (n, d, m) =>
      s"SELECT '$n' AS key_name, " +
        s"CASE WHEN (${dk(d)}) = (${dk(m)}) THEN 1 ELSE 0 END AS hit " +
        "FROM truthj"
    }.mkString("\n  UNION ALL ")
    s"""WITH clean AS (
       |  SELECT c_custkey AS ck, c_name AS nm,
       |    CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
       |    CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal
       |  FROM customer),
       |dirty AS (
       |  SELECT ck AS truth,
       |    CASE WHEN ck % 2 = 0 THEN substr(nm, 1, length(nm) - 1)
       |      ELSE nm END AS dnm,
       |    seg AS dseg,
       |    bal + CASE WHEN ck % 7 = 0 THEN 100 ELSE 0 END AS dbal
       |  FROM clean WHERE ck % 3 = 0),
       |ml AS (
       |  $mUnion),
       |dl AS (
       |  $dUnion),
       |mc AS (SELECT key_name, k, CAST(COUNT(*) AS BIGINT) AS nm
       |  FROM ml GROUP BY 1, 2),
       |dc AS (SELECT key_name, k, CAST(COUNT(*) AS BIGINT) AS nd
       |  FROM dl GROUP BY 1, 2),
       |cand AS (
       |  SELECT mc.key_name, CAST(SUM(mc.nm * dc.nd) AS BIGINT)
       |    AS n_candidates
       |  FROM mc JOIN dc ON mc.key_name = dc.key_name AND mc.k = dc.k
       |  GROUP BY 1),
       |maxb AS (SELECT key_name, MAX(nm) AS max_block_masters
       |  FROM mc GROUP BY 1),
       |truthj AS (
       |  SELECT d.truth, d.dnm, d.dseg, d.dbal, c.nm, c.seg, c.bal
       |  FROM dirty d JOIN clean c ON d.truth = c.ck),
       |hl AS (
       |  $hitCases),
       |hits AS (
       |  SELECT key_name, CAST(COUNT(*) AS BIGINT) AS n_truth,
       |    CAST(SUM(hit) AS BIGINT) AS n_hit
       |  FROM hl GROUP BY 1)
       |SELECT h.key_name, h.n_truth, h.n_hit,
       |  ${r4Sql("CAST(h.n_hit AS DOUBLE) / CAST(h.n_truth AS DOUBLE)")}
       |    AS recall,
       |  c.n_candidates, x.max_block_masters
       |FROM hits h
       |  JOIN cand c ON h.key_name = c.key_name
       |  JOIN maxb x ON h.key_name = x.key_name
       |ORDER BY h.key_name""".stripMargin
  }

  // --------------------------------------------------------------- #364
  /** #364 differentially-private release of the #314 cell histogram —
    * the counts a custodian can actually PUBLISH, completing the
    * privacy family (k-anonymity/l-diversity/t-closeness audit risk;
    * this releases). Gaussian mechanism at (ε=1, δ=10⁻⁶): each cell of
    * a disjoint-cell count histogram has L2 sensitivity Δ₂=1, so the
    * released value is n + σ·z with σ = √(2·ln(1.25/δ))·Δ₂/ε ≈ 5.2988
    * (a fixed 4-decimal literal on both engines — no libm at run
    * time). z is a standard normal realized as an Irwin-Hall(12) sum
    * of md5-seeded uniforms (Σ₁¹²u − 6: mean 0, variance 12·(1/12)=1)
    * — the stats_perm_test seeding device — so the noise is a
    * DETERMINISTIC function of the cell key: the release is
    * rerunnable, engine-exact (twelve integer md5 draws summed in
    * BIGINT; the only IEEE steps are one divide, one multiply and one
    * add applied in the same order on both engines), and
    * SQL-oracle-able, while remaining a faithful (ε,δ)-DP release
    * against any adversary without the md5 seed. The ε-accounting
    * (epsilon, delta, sigma) is emitted alongside each row, as a real
    * release ledger requires.
    *
    * Scale: the cell table is DOMAIN-sized (#314), the noise is
    * map-side hash arithmetic — one grouped shuffle at any volume.
    */
  def privacyDpRelease(spark: SparkSession, dir: String): DataFrame = {
    val twoPow32 = 4294967296.0
    val draws = (1 to 12).map(j =>
      conv(substring(md5(concat_ws("|",
        col("nation"), col("segment"), col("bal_band"),
        lit(j.toString))), 1, 8), 16, 10).cast("long"))
    qi(spark, dir)
      .groupBy("nation", "segment", "bal_band")
      .agg(count(lit(1)).as("n"))
      .withColumn("znum",
        draws.reduce(_ + _) - lit(6L * 4294967296L))
      .select(col("nation"), col("segment"), col("bal_band"),
        r4(col("n") +
          col("znum").cast("double") / twoPow32 * lit(5.2988))
          .as("n_noisy"),
        lit(1.0).as("epsilon"), lit(1.0e-6).as("delta"),
        lit(5.2988).as("sigma"))
      .orderBy("nation", "segment", "bal_band")
  }

  val privacyDpReleaseSql: String = {
    val draws = (1 to 12).map(j =>
      "('0x' || substr(md5(CAST(nation AS VARCHAR) || '|' || segment" +
        s" || '|' || CAST(bal_band AS VARCHAR) || '|' || '$j'), 1, 8))" +
        "::UBIGINT::BIGINT").mkString(" + ")
    s"""WITH q AS (
       |  $qiSql),
       |cells AS (
       |  SELECT nation, segment, bal_band,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM q GROUP BY 1, 2, 3),
       |z AS (
       |  SELECT *, ($draws) - 25769803776 AS znum FROM cells)
       |SELECT nation, segment, bal_band,
       |  ${r4Sql("n + CAST(znum AS DOUBLE) / 4294967296.0 * 5.2988")}
       |    AS n_noisy,
       |  1.0 AS epsilon, 0.000001 AS delta, 5.2988 AS sigma
       |FROM z ORDER BY nation, segment, bal_band""".stripMargin
  }

  // --------------------------------------------------------------- #368
  /** #368 differentially-private MEAN release — the other DP primitive
    * beside the #364 count histogram: per (nation, segment) cell,
    * release the mean account balance AND the cell size, each through
    * its own Gaussian mechanism (the #364 seeded Irwin-Hall device
    * with role-tagged seeds 'm'/'n', so the two draws are
    * independent), with the ε-ledger carrying the COMPOSED budget
    * (two (1, 10⁻⁶) mechanisms → epsilon_total 2.0, delta_total
    * 2·10⁻⁶ by basic composition — the accounting a release pipeline
    * must surface, not hide). Balances are CLAMPED to [-1000, 10000]
    * before the sum (TPC-H acctbal's range), which is what bounds the
    * mean's sensitivity: Δ(mean of an n-cell) = (hi−lo)/n, so the
    * noise std shrinks as cells grow — bigger data is safer data,
    * visibly. Exactness: clamped cents sum in DECIMAL (order-free),
    * one double division for the mean, the same md5-integer noise
    * path as #364 with identical IEEE op order both engines.
    */
  def privacyDpMean(spark: SparkSession, dir: String): DataFrame = {
    val twoPow32 = 4294967296.0
    def draws(tag: String) = (1 to 12).map(j =>
      conv(substring(md5(concat_ws("|", lit(tag),
        col("nation"), col("segment"),
        lit(j.toString))), 1, 8), 16, 10).cast("long"))
      .reduce(_ + _) - lit(6L * 4294967296L)
    Tables(spark, dir, "customer")
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        greatest(least(col("c_acctbal"), lit(10000.0)), lit(-1000.0))
          .cast("decimal(18,2)").as("bal"))
      .groupBy("nation", "segment")
      .agg(count(lit(1)).as("n"), sum("bal").as("s"))
      .withColumn("zm", draws("m"))
      .withColumn("zn", draws("n"))
      .select(col("nation"), col("segment"),
        r4(col("s").cast("double") / col("n") +
          col("zm").cast("double") / twoPow32 * lit(5.2988) *
            (lit(11000.0) / col("n").cast("double"))).as("mean_noisy"),
        r4(col("n") + col("zn").cast("double") / twoPow32 * lit(5.2988))
          .as("n_noisy"),
        lit(2.0).as("epsilon_total"), lit(2.0e-6).as("delta_total"),
        lit(5.2988).as("sigma"))
      .orderBy("nation", "segment")
  }

  val privacyDpMeanSql: String = {
    def draws(tag: String) = (1 to 12).map(j =>
      s"('0x' || substr(md5('$tag' || '|' || CAST(nation AS VARCHAR)" +
        s" || '|' || segment || '|' || '$j'), 1, 8))::UBIGINT::BIGINT")
      .mkString(" + ")
    s"""WITH cells AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    c_mktsegment AS segment,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    ${sumDecSql(
            "CAST(GREATEST(LEAST(c_acctbal, 10000.0), -1000.0) " +
              "AS DECIMAL(18,2))", 18, 2)} AS s
       |  FROM customer GROUP BY 1, 2),
       |z AS (
       |  SELECT *, (${draws("m")}) - 25769803776 AS zm,
       |    (${draws("n")}) - 25769803776 AS zn
       |  FROM cells)
       |SELECT nation, segment,
       |  ${r4Sql("CAST(s AS DOUBLE) / n + CAST(zm AS DOUBLE) " +
                  "/ 4294967296.0 * 5.2988 * (11000.0 / CAST(n AS DOUBLE))")}
       |    AS mean_noisy,
       |  ${r4Sql("n + CAST(zn AS DOUBLE) / 4294967296.0 * 5.2988")}
       |    AS n_noisy,
       |  2.0 AS epsilon_total, 0.000002 AS delta_total, 5.2988 AS sigma
       |FROM z ORDER BY nation, segment""".stripMargin
  }

  // ----------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "privacy_dp_release" -> (privacyDpRelease _),
    "privacy_dp_mean" -> (privacyDpMean _),
    "privacy_k_anonymity" -> (privacyKAnonymity _),
    "privacy_l_diversity" -> (privacyLDiversity _),
    "sample_neyman" -> (sampleNeyman _),
    "er_fuzzy_link" -> (erFuzzyLink _),
    "er_golden_record" -> (erGoldenRecord _),
    "er_blocking_eval" -> (erBlockingEval _),
    "privacy_t_closeness" -> (privacyTCloseness _))

  val oracles: Map[String, String] = Map(
    "privacy_dp_release" -> privacyDpReleaseSql,
    "privacy_dp_mean" -> privacyDpMeanSql,
    "privacy_k_anonymity" -> privacyKAnonymitySql,
    "privacy_l_diversity" -> privacyLDiversitySql,
    "sample_neyman" -> sampleNeymanSql,
    "er_fuzzy_link" -> erFuzzyLinkSql,
    "er_golden_record" -> erGoldenRecordSql,
    "er_blocking_eval" -> erBlockingEvalSql,
    "privacy_t_closeness" -> privacyTClosenessSql)
}
