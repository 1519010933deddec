package graft

import org.apache.spark.sql.SparkSession

/** Recursive `.parquet` listing for the footer/metadata readers.
  *
  * Measured (LAYOUT_decomp_r13.json, this box): Hadoop's
  * LocalFileSystem `fs.listFiles(root, true)` costs ~4 ms per entry —
  * 2.6 s to list a 621-file layout-tree pair — and that listing runs
  * DRIVER-side at plan-build time in every layout_* footer query, so
  * it was the single largest component of the family's amortized
  * cost. A plain NIO walk of the same tree takes ~13 ms. So:
  * local (no scheme / `file:`) paths list via NIO; any other
  * filesystem (HDFS/object stores — e.g. a `spark.graft.cacheRoot`
  * deployment) keeps the Hadoop listing, where the FS client is the
  * only correct interface. Output is sorted, so downstream plans see
  * one deterministic file order regardless of backend (results never
  * depend on it — every consumer keys by file path).
  */
object ParquetFiles {

  def list(spark: SparkSession, path: String): Seq[String] = {
    val scheme = try java.net.URI.create(path).getScheme catch {
      case _: IllegalArgumentException => null // not a URI: local path
    }
    if (scheme == null || scheme == "file") {
      val local =
        if (scheme == null) path else java.net.URI.create(path).getPath
      val root = java.nio.file.Paths.get(local)
      if (!java.nio.file.Files.exists(root)) Seq.empty
      else {
        val s = java.nio.file.Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          // regular files only: the table ROOT is itself a directory
          // named *.parquet, and Hadoop's listFiles never returned it
          s.iterator().asScala
            .filter(p => java.nio.file.Files.isRegularFile(p))
            .map(_.toString)
            .filter(_.endsWith(".parquet")).toVector.sorted
        } finally s.close()
      }
    } else {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) buf += f.toString
      }
      buf.toVector.sorted
    }
  }
}
