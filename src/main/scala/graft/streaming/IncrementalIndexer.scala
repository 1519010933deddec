package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.catalog.FileIndexer
import graft.catalog.FileIndexer.IndexFilter

/** The reference's index action as a CONTINUOUS pipeline: new
  * file-manifest messages land in a directory, each is regex-filtered
  * and level-assigned, and matching records append to the partitioned
  * parquet catalog — i.e. `reactor.py`'s message-driven indexing
  * (`/root/reference/reactor.py:147-218`) re-expressed as a Structured
  * Streaming job with exactly-once file-sink semantics.
  *
  * Scale: the stream is stateless (pure filter+project per batch), so
  * no state store grows; the sink partitions by processing_level the
  * same way the batch writer does; checkpointing makes restart
  * exactly-once over input files.
  */
object IncrementalIndexer {

  /** Manifest row schema: one JSON line per archived file. */
  val manifestSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, path STRING, n_chars BIGINT")

  /** The reference's event-forwarding settings, mirrored from its
    * `config.yml` defaults (`state_enter: false`, `state_exit: true`,
    * `standalone: false`): `stateEnter`/`stateExit` gate the
    * enter/exit `forward_event` calls around each handled action
    * (`/root/reference/reactor.py:130-141, 158-176`), and `standalone`
    * short-circuits forwarding entirely
    * (`/root/reference/reactor.py:32`) — while the two-message
    * `indexed` handshake STILL sends (reactor.py:190-208: standalone
    * only re-addresses it, it never suppresses it).
    */
  final case class ProtocolSettings(
      stateEnter: Boolean = false,
      stateExit: Boolean = true,
      standalone: Boolean = false) {
    def forwardEnter: Boolean = !standalone && stateEnter
    def forwardExit: Boolean = !standalone && stateExit
  }

  /** Exactly-once READ of the append-only catalog under at-least-once
    * message delivery: the reference sends every protocol message with
    * `retryMaxAttempts=10` (`/root/reference/reactor.py:40-42,206-208`),
    * so a redelivered index request re-runs the (deterministic) indexing
    * of the same manifest and appends identical records. Its catalog
    * absorbs that because `store.index` upserts by content; the Spark
    * analogue is merge-on-read — one `dropDuplicates` over the record's
    * full content key. Deterministic content + content-keyed dedupe =
    * idempotent catalog state, no matter how many times the message
    * arrives.
    *
    * Scale: one hash aggregation keyed on the content columns — the
    * same shuffle shape as `dedup_exact`, linear, no join.
    */
  def catalogState(catalog: DataFrame): DataFrame =
    catalog.dropDuplicates(
      Seq("doc_id", "path", "n_chars", "processing_level", "generated_by"))

  /** Fold of the handshake event log into per-job state — the job
    * manager's half of the two-message protocol ("two messages required
    * to move a job to FINISHED", `/root/reference/reactor.py:183-215`).
    * Duplicate deliveries of one `indexed` message collapse on its
    * `(uuid, batch_id)` identity BEFORE any count aggregates, so a
    * replayed handshake can't inflate `n_files` or resurrect a state:
    * FINISHED is a fixpoint, exactly as the reference's job-manager
    * transition is idempotent under its retried sends.
    */
  def jobStates(events: DataFrame): DataFrame =
    events.where(col("name") === "indexed")
      .groupBy(col("uuid"), col("batch_id"))
      .agg(max("n_files").as("n_files"))
      .groupBy(col("uuid"))
      .agg(sum("n_files").as("n_files"),
        count(lit(1)).as("n_batches"))
      .select(col("uuid"), lit("FINISHED").as("job_state"),
        col("n_files"), col("n_batches"))

  /** Start indexing manifests arriving in `inDir` into the parquet
    * catalog at `outDir`.
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, filters: Seq[IndexFilter],
      generatedBy: String): StreamingQuery = {
    val manifests = spark.readStream
      .schema(manifestSchema)
      .json(inDir)
    val indexed = FileIndexer.index(manifests, "path", filters, generatedBy)
    indexed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("processing_level")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The full reference protocol as one streaming job: validate each
    * manifest row, dead-letter the malformed ones, index the good ones,
    * and emit the `indexed` handshake event.
    *
    * The reference does NOT transition the job itself after indexing —
    * it sends a second `{uuid, name: "indexed"}` message to the job
    * manager, which owns the INDEXING → FINISHED transition
    * (`/root/reference/reactor.py:183-215`: "two messages required to
    * move a job to FINISHED"). Here that handshake is a record per
    * drained micro-batch appended to `eventsDir` — the same event log
    * the catalog operators fold (`idx_job_states` consumes exactly this
    * shape), so the index → indexed → FINISHED composition is testable
    * end-to-end.
    *
    * Delivery: foreachBatch sinks are at-least-once under failure
    * replay (the reference's `retryMaxAttempts=10` messaging is too);
    * the handshake carries `batch_id` so downstream folds can
    * deduplicate, and the catalog write is idempotent per batch via
    * deterministic content.
    */
  def startWithProtocol(spark: SparkSession, inDir: String, outDir: String,
      rejectDir: String, eventsDir: String, checkpointDir: String,
      filters: Seq[IndexFilter], generatedBy: String,
      defaultLevel: String = "1",
      settings: ProtocolSettings = ProtocolSettings()): StreamingQuery = {
    val manifests = graft.sources.CatalogIO.readStreamJson(
      spark, inDir, manifestSchema)
    // forward_event, Spark-side: one record per gated call appended to
    // the same event log the handshake uses. `phase` distinguishes
    // enter from exit; `job_state` mirrors the reference's reading
    // (INDEXING on enter — reactor.py:160 literal — and still INDEXING
    // on exit, because `store.index(transition=False)` never moves the
    // state itself; FINISHED needs the second message).
    def forward(batchId: Long, phase: String, nFiles: Long): Unit =
      spark.range(1)
        .select(lit(generatedBy).as("uuid"), lit("index").as("name"),
          lit(phase).as("phase"), lit("INDEXING").as("job_state"),
          lit(nFiles).as("n_files"), lit(batchId).as("batch_id"))
        .write.mode("append").json(eventsDir)
    manifests.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bad = batch.where(
          col("_corrupt").isNotNull || col("path").isNull)
        val good = batch.where(
          col("_corrupt").isNull && col("path").isNotNull).drop("_corrupt")
        bad.withColumn("reject_reason",
            when(col("_corrupt").isNotNull, "malformed_json")
              .otherwise("missing_path"))
          .write.mode("append").json(rejectDir)
        if (settings.forwardEnter) forward(batchId, "state_enter", 0L)
        val indexed = FileIndexer.index(good, "path", filters, generatedBy,
          defaultLevel)
        indexed.write.mode("append")
          .partitionBy("processing_level").parquet(outDir)
        // this batch's indexed count (the reference's `len(resp)`) —
        // recomputed on the tiny control-plane batch, never a rescan
        // of the accumulated catalog
        val nFiles = indexed.count()
        if (settings.forwardExit) forward(batchId, "state_exit", nFiles)
        // two-message protocol: tell the job manager we indexed — sent
        // in EVERY mode, standalone included (reactor.py:190-208)
        spark.range(1)
          .select(lit(generatedBy).as("uuid"), lit("indexed").as("name"),
            lit(nFiles).as("n_files"), lit(batchId).as("batch_id"))
          .write.mode("append").json(eventsDir)
        ()
      }
      .start()
  }
}
