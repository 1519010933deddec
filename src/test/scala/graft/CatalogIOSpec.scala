package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.CatalogIO

/** Round-trip and malformed-input behavior of the catalog IO layer. */
class CatalogIOSpec extends GraftSpec {

  test("catalog sink round-trips and partition-prunes by level") {
    val out = Files.createTempDirectory("graft_catalog").toString
    val indexed = operators.Catalog.idxIndexFiles(spark, sf)
    CatalogIO.writeCatalog(indexed, out)
    val back = spark.read.parquet(out)
    assert(back.count() == indexed.count())
    // partition pruning: the level filter must hit the directory layout
    val pruned = back.where(col("processing_level") === "1")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      indexed.where(col("processing_level") === "1").count())
    assert(scan.contains("PartitionFilters") &&
      scan.contains("processing_level"))
  }

  test("json reader enforces schema and captures malformed rows") {
    val dir = Files.createTempDirectory("graft_json")
    Files.writeString(dir.resolve("a.jsonl"),
      """{"doc_id": 1, "path": "src0/a.txt"}
        |{"doc_id": "not-a-number", "path": 7}
        |{"doc_id": 3, "path": "src1/b.csv"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("path", StringType)))
    // Spark refuses filters referencing only the corrupt column on raw
    // files; materialize rows first (what a pipeline's quarantine step
    // does anyway)
    val rows = CatalogIO.readJson(spark, dir.toString, schema).collect()
    assert(rows.count(_.getAs[String]("_corrupt") == null) == 2)
    assert(rows.count(_.getAs[String]("_corrupt") != null) == 1)
  }

  test("csv reader enforces schema and captures malformed rows") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(dir.resolve("a.csv"),
      """doc_id,path
        |1,src0/a.txt
        |oops,src9/zz
        |3,src1/b.csv
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("path", StringType)))
    val rows = CatalogIO.readCsv(spark, dir.toString, schema).collect()
    assert(rows.count(_.getAs[String]("_corrupt") == null) == 2)
    assert(rows.count(_.getAs[String]("_corrupt") != null) == 1)
  }

  test("orc sink round-trips, partition-prunes, and enforces the read " +
      "schema") {
    val out = Files.createTempDirectory("graft_orc").toString
    val indexed = operators.Catalog.idxIndexFiles(spark, sf)
    CatalogIO.writeOrc(indexed, out)
    val back = CatalogIO.readOrc(spark, out,
      StructType.fromDDL(
        "doc_id BIGINT, path STRING, processing_level STRING"))
    assert(back.count() == indexed.count())
    val pruned = back.where(col("processing_level") === "1")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      indexed.where(col("processing_level") === "1").count())
    assert(scan.contains("PartitionFilters") &&
      scan.contains("processing_level"))
  }

  test("binaryFile source ingests raw payloads with metadata, glob " +
      "filters at the listing") {
    val dir = Files.createTempDirectory("graft_bin")
    Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    Files.write(dir.resolve("b.bin"), Array[Byte](4, 5))
    Files.writeString(dir.resolve("skip.txt"), "not media")
    val rows = CatalogIO.readBinaryFiles(spark, dir.toString,
      Some("*.bin")).collect()
    assert(rows.length == 2)
    val byName = rows.map(r => (
      r.getAs[String]("path").split('/').last,
      r.getAs[Array[Byte]]("content"))).toMap
    assert(byName("a.bin").toSeq == Seq[Byte](1, 2, 3))
    assert(byName("b.bin").toSeq == Seq[Byte](4, 5))
    assert(rows.forall(_.getAs[Long]("length") > 0))
  }

  test("schema evolution: mergeSchema unions snapshot generations, old " +
      "rows null-fill added columns") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    // generation 1: (doc_id, path); generation 2 adds a checksum column
    // — the additive-evolution pattern a long-lived catalog accumulates
    Seq((1L, "a/x"), (2L, "a/y")).toDF("doc_id", "path")
      .write.mode("append").parquet(dir)
    Seq((3L, "b/z", "c0ffee")).toDF("doc_id", "path", "checksum")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "path", "checksum"))
    assert(merged.count() == 3)
    assert(merged.where(col("checksum").isNull).count() == 2)
    assert(merged.where(col("checksum") === "c0ffee")
      .select("doc_id").head().getLong(0) == 3L)
    // and WITHOUT the option the reader keeps one generation's schema —
    // the default stays cheap (no footer union scan)
    val plain = spark.read.parquet(dir)
    assert(plain.count() == 3)
  }
}
