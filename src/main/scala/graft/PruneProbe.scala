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

    // #337 row-group granularity: same discipline on the year-per-file
    // multi-row-group date layout — time decoding EVERY row group of
    // the kept files vs ONLY the surviving ones, through the identical
    // record-assembly reader (so the delta is purely the groups
    // skipped, not vectorized-vs-row codepaths).
    val (rLo, rHi) = (9190L, 9196L)
    val tmpRg = operators.Forge.writeRowGroupDateLayout(spark, sfDir)
    val rg = operators.Apex.readFooterRowGroupStats(spark, tmpRg, "day")
      .collect()
    val byFile = rg.groupBy(_.getAs[String]("path"))
    val surv = rg.filter(r => r.getAs[Long]("max_v") >= rLo &&
      r.getAs[Long]("min_v") <= rHi)
    val survByFile = surv.groupBy(_.getAs[String]("path"))
    def rgSel(sel: Map[String, Array[org.apache.spark.sql.Row]]) =
      operators.Apex.readSelectedRowGroups(spark,
        sel.map { case (p, rows) =>
          (p, rows.map(_.getAs[Int]("rg_idx")).sorted.toSeq) }.toSeq)
        .where(col("day").between(rLo, rHi))
        .agg(count(lit(1)), sum("o_orderkey"), min("day"), max("day"))
    // all row groups of KEPT files (what file-level pruning alone reads)
    val keptAll = byFile.view.filterKeys(survByFile.keySet).toMap
    rgSel(keptAll).collect()
    val tFileLevel = time(rgSel(keptAll))
    val tRgLevel = time(rgSel(survByFile))
    val rgTotalKept = keptAll.values.map(_.length).sum
    val rgRead = survByFile.values.map(_.length).sum
    println(s"""{"metric":"rowgroup_scan_read","unit":"sec",""" +
      s""""kept_files_all_groups":$tFileLevel,"surviving_groups":$tRgLevel,""" +
      s""""rg_total_kept_files":$rgTotalKept,"rg_read":$rgRead,""" +
      s""""speedup":${tFileLevel / tRgLevel},"sf":"$sfDir"}""")
    operators.Apex.deleteTempLayout(spark, tmpRg)
    spark.stop()
  }
}
