package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2 #39).
  *
  * Models how a 100 TB training-data pipeline carries image/audio/video:
  * an opaque `binary` payload column plus typed metadata extracted by a
  * batched per-partition decode. The decode itself is a STUB — a
  * deterministic fake standing in for a codec (no media libs in this
  * environment) — but everything Spark-level is real: the binary
  * schema, the typed `Dataset` hop, partition-batched iteration
  * (`mapPartitions`, the Scala analogue of `mapInPandas` batches), and
  * the metadata schema the downstream pipeline would consume.
  *
  * Scale: the payload never shuffles — decode is map-side narrow on the
  * scan partitions; only the (tiny) typed metadata flows onward.
  */
object Multimodal {

  /** One "media file": opaque bytes + the id. */
  final case class BinaryDoc(doc_id: Long, payload: Array[Byte])

  /** Typed metadata the (stub) decoder emits. */
  final case class MediaMeta(
      doc_id: Long, format: String, n_bytes: Long,
      width: Long, height: Long)

  /** STUB CODEC — deterministic fake. A real deployment decodes the
    * payload header (PNG/JPEG/WAV...) here; this fake derives plausible
    * fields from bytes so the full pipeline shape is testable:
    * format from doc_id, dimensions from first/last payload byte.
    */
  private def fakeDecode(d: BinaryDoc): MediaMeta = {
    val first = java.lang.Byte.toUnsignedLong(d.payload(0))
    val last = java.lang.Byte.toUnsignedLong(d.payload(d.payload.length - 1))
    MediaMeta(
      doc_id = d.doc_id,
      format = Seq("png", "jpg", "wav")((d.doc_id % 3).toInt),
      n_bytes = d.payload.length.toLong,
      width = 16L * (1L + first % 32L),
      height = 16L * (1L + last % 32L))
  }

  /** #39 binary-column pipeline: synthesize payloads from `documents`
    * (UTF-8 bytes stand in for media bytes), decode per-partition in
    * batches, aggregate typed metadata per format.
    */
  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bin = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[BinaryDoc]
    // partition-batched decode: one iterator per partition, no per-row
    // task overhead — the mapInPandas batch shape in Dataset form.
    val meta = bin.mapPartitions(_.map(fakeDecode))
    meta.toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        min("width").as("min_w"), max("width").as("max_w"),
        min("height").as("min_h"), max("height").as("max_h"))
      .orderBy("format")
  }

  /** The stub decode is plain byte arithmetic, so the oracle can mirror
    * it in SQL (ascii of first/last char == first/last UTF-8 byte for
    * this ASCII corpus).
    */
  val mmBinaryMetaSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['png','jpg','wav'][CAST(doc_id % 3 AS INT) + 1] AS format,
      |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |    16 * (1 + ascii(substr(text, 1, 1)) % 32) AS width,
      |    16 * (1 + ascii(substr(text, length(text), 1)) % 32) AS height
      |  FROM documents)
      |SELECT format, COUNT(*) AS n_media,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  MIN(width) AS min_w, MAX(width) AS max_w,
      |  MIN(height) AS min_h, MAX(height) AS max_h
      |FROM m GROUP BY format ORDER BY format""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (mmBinaryMeta _))

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" -> mmBinaryMetaSql)
}
