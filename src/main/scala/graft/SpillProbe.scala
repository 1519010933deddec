package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Memory-pressure probe: runs named queries against a ScaleProbe
  * replica while a SparkListener totals the task metrics that reveal
  * whether the operator survives partitions that no longer fit in
  * memory — shuffle SPILL bytes (memory + disk), peak per-task
  * execution memory, and shuffle read/write volume.
  *
  * This is the harness behind the "cluster absorbs by width" claim: at
  * 10× the heap still swallows every partition, so spill stays 0 and
  * wall-clock ratios are the whole story. At 30× on the same fixed
  * heap (-Xmx stands in for ONE executor's memory), a healthy operator
  * spills gracefully in its sort/aggregate stages and completes at
  * ~linear cost; a memory-UNBOUNDED shape (a hash agg over a
  * corpus-sized key space, a broadcast that should have been gated)
  * instead OOMs or cliffs. The probe records which one happens.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<replicaDir> runMain graft.SpillProbe
  * [query ...]` (defaults to the top-6 heavies from the 10× decade
  * sweep). One JSON line per query on stdout:
  *   {"query":…,"sec":…,"spill_mem_mb":…,"spill_disk_mb":…,
  *    "peak_task_mem_mb":…,"shuffle_write_mb":…,"shuffle_read_mb":…}
  * plus a trailing `{"metric":"spill_probe", …}` summary line; the
  * full set is also written to SPARK_GRAFT_BENCH_OUT (default
  * /tmp/spill_probe.json).
  */
object SpillProbe {

  /** The 10×-decade heavy set (PLANS.md): the graph family plus the
    * two linear-compute outliers — the shapes most likely to expose a
    * memory cliff when partition count stays fixed and volume grows.
    */
  val defaultHeavies: Seq[String] = Seq(
    "graph_components", "graph_pagerank", "graph_triangles",
    "graph_link_prediction", "ann_pq", "dedup_levenshtein")

  private final class MetricsTotals extends SparkListener {
    val spillMem = new AtomicLong
    val spillDisk = new AtomicLong
    val peakTaskMem = new AtomicLong
    val shuffleWrite = new AtomicLong
    val shuffleRead = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
        peakTaskMem.getAndAccumulate(m.peakExecutionMemory, Math.max _)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def reset(): Unit =
      Seq(spillMem, spillDisk, peakTaskMem, shuffleWrite, shuffleRead)
        .foreach(_.set(0L))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.isEmpty) defaultHeavies else args.toSeq
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = GraftSession(cpus, "graft-spill-probe")
    // SPARK_GRAFT_SATURATED=true probes the saturated-cluster profile
    // (shared subplans persisted) — the A/B lever for spill volume
    if (sys.env.get("SPARK_GRAFT_SATURATED").contains("true"))
      spark.conf.set("spark.graft.clusterSaturated", "true")
    val totals = new MetricsTotals
    spark.sparkContext.addSparkListener(totals)

    def mb(b: Long): Double = math.round(b / 1048.576) / 1000.0

    val lines = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      totals.reset()
      val t0 = System.nanoTime()
      val (sec, err) =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          ((System.nanoTime() - t0) / 1e9, None)
        } catch { case e: Throwable => (-1.0, Some(e.getMessage)) }
      // listener events post asynchronously; drain the bus so the
      // counters cover every task of the job just finished
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val line = s"""{"query":"$name","sec":${math.round(sec * 1000) / 1000.0}""" +
        s""","spill_mem_mb":${mb(totals.spillMem.get)}""" +
        s""","spill_disk_mb":${mb(totals.spillDisk.get)}""" +
        s""","peak_task_mem_mb":${mb(totals.peakTaskMem.get)}""" +
        s""","shuffle_write_mb":${mb(totals.shuffleWrite.get)}""" +
        s""","shuffle_read_mb":${mb(totals.shuffleRead.get)}""" +
        err.map(m => s""","error":"${m.replaceAll("[\"\\n]", " ").take(200)}"""")
          .getOrElse("") + "}"
      println(line)
      line
    }
    val summary =
      s"""{"metric":"spill_probe","sf":"$sfDir","heap":"${Runtime.getRuntime.maxMemory() >> 20}m","queries":[${lines.mkString(",")}]}"""
    println(summary)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/spill_probe.json"))
    java.nio.file.Files.write(out,
      (summary + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
