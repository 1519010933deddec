package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Exprs.{r4, r4Sql, sumDec, sumDecSql}

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

  // --------------------------------------------------------------- #334
  /** Deterministic raw-URL synthesis (the `pathed` device, web-shaped):
    * every group of three consecutive doc_ids spells the SAME logical
    * page three different ways — clean; upper-cased scheme/host with a
    * `www.` prefix, tracking query and fragment; percent-encoded
    * ('%61' = 'a', the reference's unquote TODO graduated —
    * reactor.py:106-114) with a `/extra/../` dot segment. A correct
    * canonicalizer must collapse each group to one canonical URL.
    */
  private def rawUrlExpr(di: (String, Int) => String): String = {
    val gid = di("doc_id", 3)
    // host derives from the GROUP id (not source — sources cycle per
    // doc, which would split every 3-doc variant group across hosts
    // and kill the planted collisions)
    val host = s"'cdn' || CAST(($gid % 7) AS STRING) || '.site' || " +
      s"CAST(($gid % 20) AS STRING) || '.com'"
    val page = s"CAST($gid AS STRING)"
    // NOTE: continuation lines must not START with '||' — stripMargin
    // eats the first pipe as the margin marker
    s"CASE CAST(doc_id % 3 AS INT) " +
      s"WHEN 0 THEN 'https://' || $host || '/docs/page-' || $page || " +
      s"'.html' " +
      s"WHEN 1 THEN 'HTTPS://WWW.' || upper($host) || '/docs/page-' || " +
      s"$page || '.html?utm_source=feed&ref=x#frag' " +
      s"ELSE 'https://' || $host || '/docs/extra/../p%61ge-' || " +
      s"$page || '.html' END"
  }

  /** Canonicalization pipeline as (column, expr-text) steps shared by
    * both engines (`rr` abstracts the one divergence: DuckDB's
    * regexp_replace needs an explicit 'g' flag where Spark is global
    * by default; patterns use bracket classes instead of backslash
    * escapes so the literal text parses identically). Steps: strip
    * query+fragment → lowercase scheme+host (path case is
    * significant!) → strip `www.` → percent-decode unreserved
    * lowercase letters (both hex spellings, a generated 52-entry
    * replace table) → resolve `/./` and one-level `/seg/../` dot
    * segments.
    */
  private def urlCanonSteps(rr: (String, String, String) => String,
      di: (String, Int) => String): Seq[(String, String)] = {
    val decode = ('a' to 'z').foldLeft("u3") { (acc, c) =>
      val h = Integer.toHexString(c.toInt)
      s"replace(replace($acc, '%$h', '$c'), '%${h.toUpperCase}', '$c')"
    }
    Seq(
      "u_raw" -> rawUrlExpr(di),
      "u1" -> rr("u_raw", "[?#].*$", ""),
      "u2" -> (s"lower(regexp_extract(u1, '^([^/]*//[^/]*)', 1)) || " +
        rr("u1", "^[^/]*//[^/]*", "")),
      "u3" -> "replace(u2, '://www.', '://')",
      "u4" -> decode,
      "canonical_url" ->
        rr(rr("u4", "/[.]/", "/"), "/[^/]+/[.][.]/", "/"))
  }

  private val rrSpark = (s: String, p: String, r: String) =>
    s"regexp_replace($s, '$p', '$r')"
  private val rrDuck = (s: String, p: String, r: String) =>
    s"regexp_replace($s, '$p', '$r', 'g')"
  private val diSpark = (a: String, b: Int) => s"($a div $b)"
  private val diDuck = (a: String, b: Int) => s"($a // $b)"

  private[graft] def canonicalized(spark: SparkSession,
      dir: String): DataFrame =
    urlCanonSteps(rrSpark, diSpark)
      .foldLeft(Tables.spread(spark, dir, "documents")) {
        case (df, (c, e)) => df.withColumn(c, expr(e))
      }

  private def canonCteSql: String = {
    val lateral = urlCanonSteps(rrDuck, diDuck)
      .map { case (c, e) => s"$e AS $c" }.mkString(",\n    ")
    s"""c AS (
       |  SELECT doc_id, source, text, n_chars,
       |    $lateral
       |  FROM documents)""".stripMargin
  }

  /** #334 URL canonicalization: collapse the raw spelling variants to
    * canonical page identities — the normalization every web-scale
    * corpus runs before URL-level dedup, host rollups, or robots
    * accounting. Emits one row per canonical URL with the raw count,
    * distinct-spelling count, and exemplar doc. Entirely map-side
    * until one keyed agg (map-side combinable); the canonicalizer is
    * a fixed expression chain inside whole-stage codegen — no UDF.
    */
  def urlCanonicalize(spark: SparkSession, dir: String): DataFrame =
    canonicalized(spark, dir)
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(col("u_raw")).as("n_variants"),
        min("doc_id").as("exemplar_doc"))
      .orderBy("canonical_url")

  val urlCanonicalizeSql: String =
    s"""WITH $canonCteSql
       |SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_raw,
       |  CAST(COUNT(DISTINCT u_raw) AS BIGINT) AS n_variants,
       |  MIN(doc_id) AS exemplar_doc
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- #335
  /** #335 host-level curation gate: roll canonical URLs up to their
    * host and emit the per-host signals a crawl curator gates on —
    * doc count, distinct pages, URL-duplication rate (raw spellings
    * per page), text-duplication rate (exact md5 collisions), mean
    * length — plus the keep verdict. Host extraction is one regex off
    * the canonical form; the rollup is one keyed agg. At 100 TB the
    * host key is the natural partition: a few million hosts, heavy
    * hitters handled by the same map-side combine as any power-law
    * key (no host ever needs its rows co-located — all signals are
    * algebraic).
    */
  def urlHostRollup(spark: SparkSession, dir: String): DataFrame =
    canonicalized(spark, dir)
      .withColumn("host",
        regexp_extract(col("canonical_url"), "^https://([^/]+)", 1))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_url")).as("n_pages"),
        countDistinct(md5(col("text"))).as("n_texts"),
        sum("n_chars").as("sum_chars"))
      .select(col("host"), col("n_docs"), col("n_pages"),
        r4(lit(1.0) - col("n_pages").cast("double") / col("n_docs"))
          .as("url_dup_rate"),
        r4(lit(1.0) - col("n_texts").cast("double") / col("n_docs"))
          .as("text_dup_rate"),
        r4(col("sum_chars").cast("double") / col("n_docs"))
          .as("avg_chars"),
        (col("n_pages").cast("double") / col("n_docs") >= 0.3 &&
          col("sum_chars").cast("double") / col("n_docs") >= 295.0)
          .as("keep"))
      .orderBy("host")

  val urlHostRollupSql: String =
    s"""WITH $canonCteSql,
       |h AS (
       |  SELECT regexp_extract(canonical_url, '^https://([^/]+)', 1)
       |      AS host,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_pages,
       |    CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_texts,
       |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |  FROM c GROUP BY 1)
       |SELECT host, n_docs, n_pages,
       |  ${r4Sql("1.0 - CAST(n_pages AS DOUBLE) / n_docs")}
       |    AS url_dup_rate,
       |  ${r4Sql("1.0 - CAST(n_texts AS DOUBLE) / n_docs")}
       |    AS text_dup_rate,
       |  ${r4Sql("CAST(sum_chars AS DOUBLE) / n_docs")} AS avg_chars,
       |  (CAST(n_pages AS DOUBLE) / n_docs >= 0.3
       |    AND CAST(sum_chars AS DOUBLE) / n_docs >= 295.0) AS keep
       |FROM h ORDER BY host""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "idx_index_files" -> (idxIndexFiles _),
    "idx_job_states" -> (idxJobStates _),
    "idx_event_history" -> (idxEventHistory _),
    "idx_level_rollup" -> (idxLevelRollup _),
    "idx_lineage" -> (idxLineage _),
    "idx_path_meta" -> (idxPathMeta _),
    "url_canonicalize" -> (urlCanonicalize _),
    "url_host_rollup" -> (urlHostRollup _))

  val oracles: Map[String, String] = Map(
    "idx_index_files" -> idxIndexFilesSql,
    "idx_job_states" -> idxJobStatesSql,
    "idx_event_history" -> idxEventHistorySql,
    "idx_level_rollup" -> idxLevelRollupSql,
    "idx_lineage" -> idxLineageSql,
    "idx_path_meta" -> idxPathMetaSql,
    "url_canonicalize" -> urlCanonicalizeSql,
    "url_host_rollup" -> urlHostRollupSql)
}
