package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Memory-pressure probe: times named queries at a (large) replica dir
  * while recording per-query executor memory behavior from task metrics —
  * spill bytes (in-memory + disk), shuffle read/write volume, and the max
  * per-task peak execution memory. This grounds the "a cluster absorbs
  * K× by partition width" claim with evidence from the regime where the
  * working set no longer fits the heap: a 30× sf0.1 replica on the same
  * 8 GiB JVM emulates one overloaded executor, so the interesting outcome
  * is NOT "no spill" but "spills to disk and completes at ~linear wall,
  * no OOM, no cliff" — exactly what Spark's sort-based shuffle and
  * spillable aggregation promise when partition counts are sized right.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.SpillProbe out.json q1 q2 ...`
  * (single timed pass per query — pressure runs are about metrics, not
  * min-of-N timing; Bench remains the timing instrument).
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SpillProbe <outFile> <query>...")
    val outFile = args(0)
    val names = args.drop(1).toSeq
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_probe30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = GraftSession(cpus, "graft-spill-probe")

    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val peakExec = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          peakExec.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val rows = names.map { name =>
      spark.catalog.clearCache()
      memSpill.set(0); diskSpill.set(0)
      shufWrite.set(0); shufRead.set(0); peakExec.set(0)
      val t0 = System.nanoTime()
      val res =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[spill] $name failed: ${e.getMessage}"); -1.0
        }
      // listener events are posted asynchronously; drain the bus so the
      // counters cover every task of the job just finished
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val row =
        s"""{"query":"$name","sec":$res,"memSpillBytes":${memSpill.get}""" +
          s""","diskSpillBytes":${diskSpill.get}""" +
          s""","shuffleWriteBytes":${shufWrite.get}""" +
          s""","shuffleReadBytes":${shufRead.get}""" +
          s""","peakTaskExecMemBytes":${peakExec.get}}"""
      println(row)
      row
    }
    val doc = rows.mkString("[", ",\n", "]\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[spill] wrote $outFile")
    spark.stop()
  }
}
