package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
