package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Exprs.{r4, r4Sql, sumDec, sumDecSql}

/** Change-data-capture shapes over the append-only event log
  * (SURVEY.md §2 #95-96).
  *
  * The reference's catalog is a mutable store fed by an event stream
  * (job state transitions — reactor.py:119-145); these operators are the
  * warehouse-side re-expressions: the SCD2 dimension build (state
  * intervals with effective_from/effective_to) and the snapshot diff a
  * downstream MERGE would consume.
  *
  * Scale notes: both operators shuffle ONCE on the entity key
  * (`user_id`). The snapshot diff aggregates latest-state via
  * `max(struct(ts, id, state))` — an ordinary partial-aggregable max, so
  * it map-side combines and never windows; SCD2 needs the full ordered
  * history per entity and uses two stacked windows over ONE Exchange
  * (Catalyst reuses the same (user_id, ts, id) sort for both).
  */
object Change {

  /** Snapshot cut for the CDC diff: 2024-01-15T00:00:00Z in epoch
    * micros — mid-range of the synthetic event log.
    */
  val CutUs = 1705276800000000L

  // ---------------------------------------------------------------- #95
  /** #95 SCD2 interval build: collapse each user's event stream to its
    * distinct state runs (consecutive duplicate event_types merge), then
    * emit type-2 rows [effective_from, effective_to) with an is_current
    * flag. The change filter (lag) and the interval close (lead) are two
    * window passes over the SAME partitioning — one shuffle total.
    */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val changes = Tables.eventsUs(spark, dir)
      .select("user_id", "event_id", "ts_us", "event_type")
      .withColumn("prev_type", lag(col("event_type"), 1).over(ord))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    changes
      .withColumn("effective_to", lead(col("ts_us"), 1).over(ord))
      .select(col("user_id"), col("event_id"),
        col("event_type").as("state"),
        col("ts_us").as("effective_from"), col("effective_to"),
        col("effective_to").isNull.cast("long").as("is_current"))
      .orderBy("user_id", "effective_from", "event_id")
  }

  val scd2Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
      |  FROM events),
      |ch AS (
      |  SELECT * FROM (
      |    SELECT *, LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id) AS prev_type
      |    FROM e)
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id, event_id, event_type AS state,
      |  ts_us AS effective_from,
      |  LEAD(ts_us) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id) AS effective_to,
      |  CAST((LEAD(ts_us) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id)) IS NULL AS BIGINT) AS is_current
      |FROM ch
      |ORDER BY user_id, effective_from, event_id""".stripMargin

  // ---------------------------------------------------------------- #96
  /** #96 CDC snapshot diff: each user's latest state as-of the cut vs
    * as-of end-of-log, classified INSERT / UPDATE / NOCHANGE (the log is
    * append-only, so DELETE cannot occur — documented, not silently
    * dropped). Latest-state is `max(struct(ts_us, event_id,
    * event_type))` — partial-aggregable, so both snapshots reduce
    * map-side before one shuffle each; the diff join is user_id-keyed
    * and both sides arrive pre-aggregated (entity-sized, not
    * event-sized).
    */
  def cdcStateDiff(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsUs(spark, dir)
      .select("user_id", "event_id", "ts_us", "event_type")
    def latest(df: DataFrame, as: String): DataFrame = df
      .groupBy("user_id")
      .agg(max(struct(col("ts_us"), col("event_id"), col("event_type")))
        .getField("event_type").as(as))
    val s1 = latest(e.where(col("ts_us") < lit(CutUs)), "state_t1")
      .withColumnRenamed("user_id", "u1")
    val s2 = latest(e, "state_t2")
    s2.join(s1, col("user_id") === col("u1"), "left")
      .select(col("user_id"), col("state_t1"), col("state_t2"),
        when(col("state_t1").isNull, "INSERT")
          .when(col("state_t1") === col("state_t2"), "NOCHANGE")
          .otherwise("UPDATE").as("change_type"))
      .orderBy("user_id")
  }

  val cdcSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
       |  FROM events),
       |s1 AS (
       |  SELECT user_id,
       |    (max({'t': ts_us, 'e': event_id, 's': event_type})).s AS state_t1
       |  FROM e WHERE ts_us < $CutUs GROUP BY user_id),
       |s2 AS (
       |  SELECT user_id,
       |    (max({'t': ts_us, 'e': event_id, 's': event_type})).s AS state_t2
       |  FROM e GROUP BY user_id)
       |SELECT s2.user_id, state_t1, state_t2,
       |  CASE WHEN state_t1 IS NULL THEN 'INSERT'
       |       WHEN state_t1 = state_t2 THEN 'NOCHANGE'
       |       ELSE 'UPDATE' END AS change_type
       |FROM s2 LEFT JOIN s1 ON s2.user_id = s1.user_id
       |ORDER BY s2.user_id""".stripMargin

  // --------------------------------------------------------------- #103
  /** #103 first-order Markov transition matrix of the event state
    * machine: count every consecutive (src → dst) event-type pair per
    * user, then the row-normalized transition probability. The lag
    * pairing shuffles once on user_id; the count is a tiny
    * (|types|²-row) keyed agg; the normalizer is a window sum OVER the
    * aggregated matrix, so no second pass over events. Probability =
    * n/row_total — one IEEE division of exact integers, engine-stable
    * under r4.
    */
  def eventsMarkov(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wSrc = Window.partitionBy("src")
    Tables.eventsUs(spark, dir)
      .select("user_id", "event_id", "ts_us", "event_type")
      .withColumn("dst", lead(col("event_type"), 1).over(ord))
      .where(col("dst").isNotNull)
      .select(col("event_type").as("src"), col("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("n"))
      .withColumn("prob",
        r4(col("n") / sum(col("n")).over(wSrc).cast("double")))
      .orderBy("src", "dst")
  }

  val eventsMarkovSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
       |  FROM events),
       |p AS (
       |  SELECT event_type AS src,
       |    LEAD(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts_us, event_id) AS dst
       |  FROM e),
       |m AS (
       |  SELECT src, dst, COUNT(*) AS n FROM p
       |  WHERE dst IS NOT NULL GROUP BY src, dst)
       |SELECT src, dst, n,
       |  ${r4Sql("n / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE)")}
       |    AS prob
       |FROM m ORDER BY src, dst""".stripMargin

  // --------------------------------------------------------------- #105
  /** #105 top user journeys: the most frequent length-3 event-type
    * paths (trigrams of each user's time-ordered stream). Two stacked
    * leads over ONE user_id Exchange build the paths; the count is a
    * tiny (≤|types|³-row) keyed agg with map-side combine. The
    * Sankey-diagram feed of product analytics, and a sequence-mining
    * primitive (the Markov matrix #103 is its order-1 marginal).
    */
  def eventsPaths(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.eventsUs(spark, dir)
      .select("user_id", "event_id", "ts_us", "event_type")
      .withColumn("e2", lead(col("event_type"), 1).over(ord))
      .withColumn("e3", lead(col("event_type"), 2).over(ord))
      .where(col("e3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
        col("e3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("step1"), col("step2"), col("step3"))
      .limit(25)
  }

  val eventsPathsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
      |  FROM events),
      |p AS (
      |  SELECT event_type AS step1,
      |    LEAD(event_type, 1) OVER w AS step2,
      |    LEAD(event_type, 2) OVER w AS step3
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
      |SELECT step1, step2, step3, COUNT(*) AS n FROM p
      |WHERE step3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, step1, step2, step3 LIMIT 25""".stripMargin

  // --------------------------------------------------------------- #284
  /** #284 compaction plan for the CDC'd snapshot: fold the #238 change
    * batch into the orders base (delete ≡0 mod 11; update ≡0 mod 7 gets
    * price+100; insert ≡0 mod 13 re-lands at +3·10⁹) and emit the FILE
    * PLAN the compactor would write — per (partition=o_orderstatus,
    * file_id) with a 2048-row target: row count, the contiguous key
    * range [min_key, max_key], and the decimal-exact price total. This
    * is the read-side half of `sources.CatalogCompaction` (which
    * performs the physical rewrite — dynamic partition overwrite,
    * bucketed tasks, `maxRecordsPerFile` cap — proven equal to the
    * merge-on-read view in CatalogCompactionSpec); the PLAN assigns
    * files as contiguous key ranges, the deterministic mirror of the
    * writer's range-clustered split, so the oracle can check it
    * exactly.
    *
    * Scale: the merge is #238's equi-join shape (change-sized sides
    * broadcast); the file assignment is one row_number window per
    * partition — fine for a per-partition maintenance pass (the window
    * partitions by the same column the files do), and the emitted plan
    * is file-count-sized, not row-sized.
    */
  def cdcCompact(spark: SparkSession, dir: String): DataFrame = {
    val target = 2048
    val base = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val deletes = base.where(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey"))
    val updates = base
      .where(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + lit(100.0)).as("new_price"))
    val inserts = base.where(col("o_orderkey") % 13 === 0)
      .select((col("o_orderkey") + lit(3000000000L)).as("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice").as("price"))
    val merged = base
      .join(deletes, Seq("o_orderkey"), "left_anti")
      .join(updates, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"), col("o_orderstatus"),
        coalesce(col("new_price"), col("o_totalprice")).as("price"))
      .unionByName(inserts)
    val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    merged
      .withColumn("rn", row_number().over(w))
      .withColumn("file_id",
        expr(s"cast((rn - 1) div $target as bigint)"))
      .groupBy(col("o_orderstatus"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"),
        sumDec(col("price"), 38, 2).as("total_price"))
      .orderBy("o_orderstatus", "file_id")
  }

  val cdcCompactSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
       |merged AS (
       |  SELECT b.o_orderkey, b.o_orderstatus,
       |    CASE WHEN b.o_orderkey % 7 = 0 THEN b.o_totalprice + 100.0
       |         ELSE b.o_totalprice END AS price
       |  FROM base b WHERE b.o_orderkey % 11 <> 0
       |  UNION ALL
       |  SELECT o_orderkey + 3000000000, o_orderstatus, o_totalprice
       |  FROM base WHERE o_orderkey % 13 = 0),
       |planned AS (
       |  SELECT o_orderstatus, o_orderkey, price,
       |    CAST((ROW_NUMBER() OVER (PARTITION BY o_orderstatus
       |      ORDER BY o_orderkey) - 1) // 2048 AS BIGINT) AS file_id
       |  FROM merged)
       |SELECT o_orderstatus, file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
       |  ${sumDecSql("price", 38, 2)} AS total_price
       |FROM planned GROUP BY 1, 2
       |ORDER BY o_orderstatus, file_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_intervals" -> (scd2Intervals _),
    "cdc_state_diff" -> (cdcStateDiff _),
    "events_markov" -> (eventsMarkov _),
    "events_paths" -> (eventsPaths _),
    "cdc_compact" -> (cdcCompact _))

  val oracles: Map[String, String] = Map(
    "scd2_intervals" -> scd2Sql,
    "cdc_state_diff" -> cdcSql,
    "events_markov" -> eventsMarkovSql,
    "events_paths" -> eventsPathsSql,
    "cdc_compact" -> cdcCompactSql)
}
