package graft

import org.apache.spark.sql.functions._

/** Wall-time evidence for the #332 pruned-scan executor: writes the
  * z-order layout ONCE, then times the full scan vs the footer-pruned
  * read of the SAME residual-filtered aggregate (min-of-3 each, noop
  * sink, cache cleared between runs). The layout write is outside
  * both timings — this isolates the read-path saving the file
  * skipping buys, which is the number the layout program exists for.
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.PruneProbe`.
  */
object PruneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = GraftSession(cpus, "graft-prune-probe")
    val (dLo, dHi, cV) = (9190L, 9220L, 7L)

    val tmp = java.nio.file.Files
      .createTempDirectory("graft_prune_probe").toString
    operators.Forge.ordersZFrame(spark, sfDir)
      .repartition(col("zb"))
      .sortWithinPartitions("zb", "z", "o_orderkey")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 512L)
      .partitionBy("zb").parquet(tmp)

    val stats = operators.Forge.footerTwoDimStats(spark, tmp, "z")
      .collect()
    val survivors = stats.filter { r =>
      r.getAs[Long]("max_day") >= dLo && r.getAs[Long]("min_day") <= dHi &&
        r.getAs[Long]("max_cb") >= cV && r.getAs[Long]("min_cb") <= cV
    }.map(_.getAs[String]("path"))

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .where(col("day").between(dLo, dHi) && col("cb") === cV)
      .agg(count(lit(1)), sum("o_orderkey"), min("day"), max("day"))
    def time(f: => org.apache.spark.sql.DataFrame): Double =
      (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    // warm both paths once (file-index/codegen), then time
    agg(spark.read.parquet(tmp)).collect()
    val tFull = time(agg(spark.read.parquet(tmp)))
    val tPruned = time(agg(
      spark.read.option("basePath", tmp).parquet(survivors.toSeq: _*)))
    println(s"""{"metric":"pruned_scan_read","unit":"sec",""" +
      s""""full":$tFull,"pruned":$tPruned,""" +
      s""""files_total":${stats.length},"files_read":${survivors.length},""" +
      s""""speedup":${tFull / tPruned},"sf":"$sfDir"}""")
    operators.Apex.deleteTempLayout(spark, tmp)
    spark.stop()
  }
}
