package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.catalog.FileIndexer.IndexFilter

/** The reference's inbound-message contract, Spark-side.
  *
  * Every message the reference consumes is validated against a JSON
  * schema before any work happens (`/root/reference/reactor.py:67-82`:
  * try `index.jsonschema`, then `indexed.jsonschema`, else the message
  * is failed), and parameters resolve message → context → environment
  * with a default processing level of "1"
  * (`/root/reference/reactor.py:88-104`). This module re-expresses both
  * as declarative DataFrame transforms: a validated request stream and
  * a dead-letter stream, split by a single `reject_reason` column — no
  * row is ever silently dropped, and no bad row kills the job.
  *
  * Scale: validation is a per-row projection (whole-stage codegen, no
  * shuffle); the dead-letter split is two filters over one scan.
  */
object IndexRequests {

  /** Request message schema — the Spark mirror of
    * `/root/reference/schemas/index.jsonschema` (uuid + name required,
    * optional level/token and a filter list of
    * `{processing_level, patterns}` objects — shape:
    * `/root/reference/tests/data/index01.json`).
    */
  val requestSchema: StructType = StructType.fromDDL(
    """uuid STRING, name STRING, level STRING, token STRING,
      |filters ARRAY<STRUCT<processing_level STRING,
      |  patterns ARRAY<STRING>>>""".stripMargin.replace("\n", " "))

  /** Read raw request messages (JSON lines); malformed JSON is captured
    * per-row in `_corrupt`, never fatal.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    graft.sources.CatalogIO.readJson(spark, path, requestSchema)

  /** `minify_job_dict` parity (`/root/reference/reactor.py:16-25`): the
    * reference strips an EXPLICIT key list — `_links`, `retries`,
    * `localId` — from every inbound job dict before processing, so a
    * persisted raw message never carries them. `drop` is a no-op for
    * absent columns, mirroring the reference's `if strip_key in
    * post_dict` guard; all other keys ride through untouched.
    */
  val minifyStripKeys: Seq[String] = Seq("_links", "retries", "localId")

  def minify(df: DataFrame): DataFrame = df.drop(minifyStripKeys: _*)

  /** First failed check, as the reference's validator would report it;
    * NULL = valid. The checks mirror index.jsonschema: parseable,
    * required uuid, required name, name ∈ {index, indexed}, and every
    * filter entry (when present) carries a level and ≥1 pattern.
    */
  def rejectReason: Column =
    when(col("_corrupt").isNotNull, "malformed_json")
      .when(col("uuid").isNull, "missing_uuid")
      .when(col("name").isNull, "missing_name")
      .when(!col("name").isin("index", "indexed"), "unknown_action")
      .when(col("filters").isNotNull &&
        exists(col("filters"), f =>
          f.getField("processing_level").isNull ||
            f.getField("patterns").isNull ||
            size(f.getField("patterns")) === 0),
        "bad_filter_shape")
      .otherwise(lit(null).cast("string"))

  /** Valid requests with parameters resolved the reference's way:
    * message value, else context, else environment, else the default —
    * level defaults to "1" (`reactor.py:92` `("level", "level", "1")`).
    */
  def accepted(messages: DataFrame,
      contextLevel: Option[String] = None,
      envLevel: Option[String] = None): DataFrame = {
    val fallback = contextLevel.orElse(envLevel).getOrElse("1")
    messages
      .withColumn("reject_reason", rejectReason)
      .where(col("reject_reason").isNull)
      .withColumn("level", coalesce(col("level"), lit(fallback)))
      .select("uuid", "name", "level", "token", "filters")
  }

  /** Python-`unquote` parity for percent-encoded URL parameters — the
    * reference's own TODO (`/root/reference/reactor.py:106-110`: the
    * commented-out `unquote(f)` loop under "TODO implement urldecode
    * on ?filters parameter"). Decodes %XX sequences ONLY: a literal
    * `+` must survive (regex "one or more"), unlike `url_decode`'s
    * form-encoding semantics where `+` means space — protecting `+`
    * as %2B first makes the builtin exactly `unquote`. A string with
    * no escapes passes through unchanged, so decoding an
    * already-plain pattern is the identity (same reason the
    * reference could apply unquote to whatever source resolved).
    * Deviation, documented: a MALFORMED escape (`%G1`) errors here
    * where Python's unquote passes it through — fail-fast on a
    * corrupt control message beats silently indexing with a pattern
    * that was mangled in transit.
    */
  def percentDecode(c: Column): Column =
    url_decode(regexp_replace(c, "\\+", "%2B"))

  /** [[percentDecode]] over a whole filter list: every pattern decodes,
    * levels ride through.
    */
  def percentDecodeFilters(filters: Column): Column =
    transform(filters, f =>
      struct(
        f.getField("processing_level").as("processing_level"),
        transform(f.getField("patterns"), percentDecode(_)).as("patterns")))

  /** Reference-faithful routing with the `urlparams` fallback
    * (`/root/reference/reactor.py:66` sets `action = "urlparams"`
    * BEFORE schema validation, and `reactor.py:147` indexes for
    * `action in ["index", "urlparams"]`): a message that fails BOTH
    * schemas is not dead-lettered — it still indexes, with every
    * parameter resolved message → context → environment → default.
    * Even unparseable JSON indexes when the request context supplies
    * the uuid (the reference's `mes = {}` path at reactor.py:58-63).
    * The only hard failure is an unresolvable uuid (the reference
    * would construct its job instance with `uuid=None` and fail).
    *
    * `strict = true` restores the `accepted`/`deadLetter` contract —
    * every schema-invalid message rejects — for deployments that want
    * auditable intake over URL-param compatibility.
    *
    * Output columns: uuid, action ("index" | "indexed" | "urlparams"),
    * level, token, filters, reject_reason (NULL = routed). Rows with
    * action "index"/"urlparams" feed `FileIndexer`; "indexed" feeds the
    * handshake consumer. Same execution shape as `accepted`: one
    * codegen'd projection, no shuffle.
    */
  def routed(messages: DataFrame,
      contextUuid: Option[String] = None,
      envUuid: Option[String] = None,
      contextLevel: Option[String] = None,
      envLevel: Option[String] = None,
      contextToken: Option[String] = None,
      envToken: Option[String] = None,
      contextFiltersJson: Option[String] = None,
      envFiltersJson: Option[String] = None,
      strict: Boolean = false): DataFrame = {
    val uuidFallback = contextUuid.orElse(envUuid)
      .map(lit).getOrElse(lit(null).cast("string"))
    val levelFallback = contextLevel.orElse(envLevel).getOrElse("1")
    val tokenFallback = contextToken.orElse(envToken)
      .map(lit).getOrElse(lit(null).cast("string"))
    // context/env supply filters as their JSON string representation
    // (reactor.py:106-110 notes exactly this encoding); parse against the
    // same struct shape the message schema uses so downstream consumers
    // see one filter type regardless of where the value resolved from.
    // URL-sourced patterns percent-decode (the ?filters parameter rides
    // in percent-encoded — the reference's TODO); message-borne filters
    // stay untouched, which the reference calls out as already usable
    // ("This is enough for filters passed from message")
    val filtersType = requestSchema("filters").dataType
    val filtersFallback = contextFiltersJson.orElse(envFiltersJson)
      .map(j => percentDecodeFilters(from_json(lit(j), filtersType)))
      .getOrElse(lit(null).cast(filtersType))
    val schemaReason = rejectReason
    val resolvedUuid = coalesce(col("uuid"), uuidFallback)
    val reason =
      if (strict) schemaReason
      else when(resolvedUuid.isNull,
        // surface the schema failure when there is one (malformed_json,
        // missing_uuid); a schema-VALID row can only land here never —
        // valid implies uuid present
        coalesce(schemaReason, lit("missing_uuid")))
        .otherwise(lit(null).cast("string"))
    messages
      .withColumn("reject_reason", reason)
      .withColumn("action",
        when(schemaReason.isNull, col("name")).otherwise(lit("urlparams")))
      .withColumn("uuid", resolvedUuid)
      .withColumn("level", coalesce(col("level"), lit(levelFallback)))
      .withColumn("token", coalesce(col("token"), tokenFallback))
      .withColumn("filters", coalesce(col("filters"), filtersFallback))
      .select("uuid", "action", "level", "token", "filters",
        "reject_reason")
  }

  /** The dead-letter stream: every message that failed validation, with
    * the raw payload (when parseable fields exist they ride along) and
    * the reason — the Spark form of `rx.on_failure("Message was not
    * processed", …)`, routed to a sink instead of a log line.
    */
  def deadLetter(messages: DataFrame): DataFrame =
    messages
      .withColumn("reject_reason", rejectReason)
      .where(col("reject_reason").isNotNull)

  /** Driver-side extraction of one validated request row into the
    * typed filter list `FileIndexer` consumes. Control messages are
    * tiny (a handful of filters), so this is a legitimate driver
    * operation — the DATA never leaves the cluster.
    */
  def filtersOf(row: org.apache.spark.sql.Row): Seq[IndexFilter] = {
    val idx = row.fieldIndex("filters")
    if (row.isNullAt(idx)) Seq.empty
    else row.getSeq[org.apache.spark.sql.Row](idx).map { f =>
      IndexFilter(f.getString(0), f.getSeq[String](1))
    }
  }
}
