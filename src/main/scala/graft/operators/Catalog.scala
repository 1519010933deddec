package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Exprs.{sumDec, sumDecSql}

/** Indexer/catalog domain (SURVEY.md §2 #1-6): the reference system's
  * own surface re-expressed as Spark plans.
  *
  * The reference walks a job's archive path, selects files with
  * `{processing_level, patterns:[regex]}` filters (first match wins —
  * `/root/reference/reactor.py:162-167`, filter shape
  * `/root/reference/tests/data/index01.json`), writes one catalog record
  * per matched file linked to the job via `generated_by` lineage
  * (`reactor.py:166`), and maintains an event-sourced job state machine
  * (`reactor.py:119-145`).
  *
  * Here `documents` plays the archive (one row = one archived file;
  * a deterministic path is synthesized from `source`/`doc_id`), and
  * `events` plays the per-job event log (`user_id` = job id).
  *
  * Scale: everything is a single scan + narrow projection or a single
  * keyed shuffle; the regex filter match is a constant-size CASE chain
  * evaluated in whole-stage codegen, never a driver-side loop over
  * filter objects.
  */
object Catalog {

  /** Archive-file paths synthesized deterministically from documents:
    * `src7/job-3/output_143.tsv`. Extension cycles over 5 types so every
    * filter level is populated.
    */
  private def pathed(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("ext",
        element_at(array(lit(".txt"), lit(".tsv"), lit(".csv"),
          lit(".json"), lit(".log")), (col("doc_id") % 5 + 1).cast("int")))
      .withColumn("path", concat(col("source"), lit("/job-"),
        col("doc_id") % 20, lit("/output_"), col("doc_id"), col("ext")))

  private val pathedSql =
    """pathed AS (
      |  SELECT *,
      |    ['.txt','.tsv','.csv','.json','.log'][CAST(doc_id % 5 AS INT) + 1]
      |      AS ext,
    source || '/job-' || CAST(doc_id % 20 AS VARCHAR) || '/output_' ||
      CAST(doc_id AS VARCHAR) ||
      ['.txt','.tsv','.csv','.json','.log'][CAST(doc_id % 5 AS INT) + 1]
      AS path
      |  FROM documents)""".stripMargin

  /** The index filter list, modeled on the reference's
    * `{processing_level, patterns}` shape: first matching filter assigns
    * the level; unmatched files are not indexed.
    */
  private val filters: Seq[(String, Seq[String])] = Seq(
    "1" -> Seq("\\.csv$", "\\.json$"),
    "2" -> Seq("\\.txt$", "\\.tsv$"))
  // .log deliberately unmatched — the reference skips non-matching files.

  private def indexFilters = filters.map { case (lvl, pats) =>
    graft.catalog.FileIndexer.IndexFilter(lvl, pats)
  }

  /** #1 archive-path indexing: regex filters -> processing level, via
    * the reusable [[graft.catalog.FileIndexer]] API.
    */
  def idxIndexFiles(spark: SparkSession, dir: String): DataFrame =
    graft.catalog.FileIndexer
      .index(pathed(spark, dir), "path", indexFilters,
        generatedBy = "graft-pipeline")
      .select("doc_id", "path", "processing_level")
      .orderBy("doc_id")

  private def levelCaseSql: String = {
    val whens = filters.map { case (lvl, pats) =>
      val cond = pats.map(p => s"regexp_matches(path, '$p')").mkString(" OR ")
      s"WHEN $cond THEN '$lvl'"
    }.mkString(" ")
    s"CASE $whens END"
  }

  val idxIndexFilesSql: String =
    s"""WITH $pathedSql
       |SELECT doc_id, path, $levelCaseSql AS processing_level
       |FROM pathed
       |WHERE $levelCaseSql IS NOT NULL
       |ORDER BY doc_id""".stripMargin

  /** State machine event-name -> job-state mapping (the reference's
    * pipeline states: reactor.py 'index' -> INDEXING, 'indexed' ->
    * terminal; here each event type enters a fixed state).
    */
  private val stateCaseSpark =
    expr("""CASE event_type
            WHEN 'signup' THEN 'CREATED'
            WHEN 'view' THEN 'RUNNING'
            WHEN 'click' THEN 'RUNNING'
            WHEN 'purchase' THEN 'INDEXED'
            WHEN 'error' THEN 'FAILED'
          END""")
  private val stateCaseSql =
    """CASE event_type
      |    WHEN 'signup' THEN 'CREATED'
      |    WHEN 'view' THEN 'RUNNING'
      |    WHEN 'click' THEN 'RUNNING'
      |    WHEN 'purchase' THEN 'INDEXED'
      |    WHEN 'error' THEN 'FAILED'
      |  END""".stripMargin

  /** #2 event-sourced job state: latest event per job decides the
    * current state (`store.state`). Single shuffle on user_id; the
    * (ts_us DESC, event_id DESC) order is total so the pick is
    * engine-deterministic.
    */
  def idxJobStates(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(desc("ts_us"), desc("event_id"))
    Tables.eventsUs(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts_us").as("last_ts_us"), stateCaseSpark.as("job_state"))
      .orderBy("user_id")
  }

  val idxJobStatesSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
       |  FROM events)
       |SELECT user_id, event_id AS last_event_id, ts_us AS last_ts_us,
       |  $stateCaseSql AS job_state
       |FROM e WHERE rn = 1
       |ORDER BY user_id""".stripMargin

  /** #3 per-job event history: the append-only log summarized
    * (`store.last_event`, history amendment). One keyed shuffle with
    * map-side partial aggregation.
    */
  def idxEventHistory(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("first_ts_us"),
        max("ts_us").as("last_ts_us"),
        countDistinct("event_type").as("n_event_types"),
        count(when(col("event_type") === "error", 1)).as("n_errors"))
      .orderBy("user_id")

  val idxEventHistorySql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  MIN(epoch_us(ts)) AS first_ts_us,
      |  MAX(epoch_us(ts)) AS last_ts_us,
      |  COUNT(DISTINCT event_type) AS n_event_types,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** #4 catalog discovery rollup: indexed products per (level, source)
    * with grand totals.
    */
  def idxLevelRollup(spark: SparkSession, dir: String): DataFrame = {
    graft.catalog.FileIndexer
      .index(pathed(spark, dir), "path", indexFilters,
        generatedBy = "graft-pipeline")
      .rollup("processing_level", "source")
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_chars")).as("total_chars"))
      .select(
        coalesce(col("processing_level"), lit("ALL")).as("level"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_files"), col("total_chars"))
      .orderBy("level", "source")
  }

  val idxLevelRollupSql: String =
    s"""WITH $pathedSql,
       |indexed AS (
       |  SELECT $levelCaseSql AS processing_level, source, n_chars
       |  FROM pathed WHERE $levelCaseSql IS NOT NULL)
       |SELECT COALESCE(processing_level, 'ALL') AS level,
       |  COALESCE(source, 'ALL') AS source,
       |  COUNT(*) AS n_files, CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM indexed
       |GROUP BY ROLLUP(processing_level, source)
       |ORDER BY level, source""".stripMargin

  /** #5 `generated_by` lineage chain: fact -> dim -> dim -> dim
    * (orders -> customer -> nation -> region), dims broadcast. The
    * chain resolves each order's provenance the way the reference
    * resolves file -> job -> pipeline -> process lineage.
    */
  def idxLineage(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_orders"),
        sumDec(col("o_totalprice"), 18, 2).as("total_price"))
      .orderBy("r_name", "n_name")
  }

  val idxLineageSql: String =
    s"""SELECT r_name, n_name, COUNT(*) AS n_orders,
       |  ${sumDecSql("o_totalprice", 18, 2)} AS total_price
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  /** #6 path metadata extraction (datacatalog filetype inference):
    * dirname / filename / extension per file, summarized per extension.
    */
  def idxPathMeta(spark: SparkSession, dir: String): DataFrame =
    pathed(spark, dir)
      .select(
        regexp_extract(col("path"), "^(.*)/[^/]+$", 1).as("dirname"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("filename"),
        regexp_extract(col("path"), "\\.([a-z]+)$", 1).as("extension"),
        col("n_chars"))
      .groupBy("extension")
      .agg(count(lit(1)).as("n_files"),
        countDistinct("dirname").as("n_dirs"),
        sum("n_chars").as("total_chars"),
        min("filename").as("first_file"))
      .orderBy("extension")

  val idxPathMetaSql: String =
    s"""WITH $pathedSql,
       |meta AS (
       |  SELECT regexp_extract(path, '^(.*)/[^/]+$$', 1) AS dirname,
       |    regexp_extract(path, '([^/]+)$$', 1) AS filename,
       |    regexp_extract(path, '\\.([a-z]+)$$', 1) AS extension,
       |    n_chars
       |  FROM pathed)
       |SELECT extension, COUNT(*) AS n_files,
       |  COUNT(DISTINCT dirname) AS n_dirs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  MIN(filename) AS first_file
       |FROM meta GROUP BY extension ORDER BY extension""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "idx_index_files" -> (idxIndexFiles _),
    "idx_job_states" -> (idxJobStates _),
    "idx_event_history" -> (idxEventHistory _),
    "idx_level_rollup" -> (idxLevelRollup _),
    "idx_lineage" -> (idxLineage _),
    "idx_path_meta" -> (idxPathMeta _))

  val oracles: Map[String, String] = Map(
    "idx_index_files" -> idxIndexFilesSql,
    "idx_job_states" -> idxJobStatesSql,
    "idx_event_history" -> idxEventHistorySql,
    "idx_level_rollup" -> idxLevelRollupSql,
    "idx_lineage" -> idxLineageSql,
    "idx_path_meta" -> idxPathMetaSql)
}
