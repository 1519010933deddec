package graft

/** r13 measurement probe for the layout family (r12 verdict item 5):
  * decompose `layout_overlap_depth` / `layout_hilbert_footer` into
  * (one-time layout WRITE) vs (footer READ) vs (ANALYSIS) so the
  * standing "bounded below by real file I/O" claim is measured, not
  * asserted. Same timing discipline as Bench (noop sink, labeled
  * jobs); cold-vs-warm passes separate the LayoutCache write from the
  * amortized cost. Prints one JSON line; the committed artifact is
  * LAYOUT_decomp_r13.json.
  */
object LayoutDecompProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = GraftSession(appName = "layout-decomp-probe")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Double = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // 1. one-time layout writes, cold (first LayoutCache call per key)
    out("write_date512_cold") =
      time("write date512")(operators.Forge.date512Layout(spark, sfDir))
    out("write_z512_cold") =
      time("write z512")(operators.Forge.z512Layout(spark, sfDir))
    val tD = operators.Forge.date512Layout(spark, sfDir)
    val tZ = operators.Forge.z512Layout(spark, sfDir)
    // 2. footer read of both trees (the stats frame overlap_depth and
    //    zorder_footer consume), twice: warm FS cache is the bench
    //    regime
    def footerStats() = operators.Forge
      .footerTwoDimStats(spark, tD, "date_clustered")
      .unionByName(operators.Forge.footerTwoDimStats(spark, tZ, "zorder"))
    out("footer_stats_pass1") = time("footer stats 1")(noop(footerStats()))
    out("footer_stats_pass2") = time("footer stats 2")(noop(footerStats()))
    // raw driver-side sequential decomposition of the same read: how
    // much is listing, how much footer parsing, how many files
    val hconf = spark.sparkContext.hadoopConfiguration
    def listParquet(root: String): Seq[org.apache.hadoop.fs.Path] = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(hconf)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.Path]
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    var files: Seq[org.apache.hadoop.fs.Path] = Seq.empty
    out("list_both_trees") = time("list") {
      files = listParquet(tD) ++ listParquet(tZ)
    }
    out("n_files") = files.size.toDouble
    out("serial_footer_parse") = time("serial footers") {
      files.foreach { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, hconf))
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.foreach { b =>
            b.getColumns.asScala.foreach(c => c.getStatistics)
          }
        } finally r.close()
      }
    }
    // hypothesis tests: NIO listing vs Hadoop listing; raw
    // (checksum-free) FS footer opens vs the checksummed default
    var nioFiles: Seq[java.nio.file.Path] = Seq.empty
    out("list_both_trees_nio") = time("list nio") {
      def walk(root: String): Seq[java.nio.file.Path] = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(_.toString.endsWith(".parquet")).toVector
        } finally s.close()
      }
      nioFiles = walk(tD) ++ walk(tZ)
    }
    out("n_files_nio") = nioFiles.size.toDouble
    out("serial_footer_parse_raw") = time("serial footers raw") {
      val raw = new org.apache.hadoop.fs.RawLocalFileSystem()
      raw.initialize(java.net.URI.create("file:///"), hconf)
      files.foreach { f =>
        val st = raw.getFileStatus(f)
        val in = org.apache.parquet.hadoop.util.HadoopStreams.wrap(
          raw.open(f))
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          new org.apache.parquet.io.InputFile {
            override def getLength: Long = st.getLen
            override def newStream() = in
          })
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.foreach { b =>
            b.getColumns.asScala.foreach(c => c.getStatistics)
          }
        } finally r.close()
      }
    }
    // 3. the full registered queries, twice each (pass2 ~ Bench's
    //    min-of-2 regime; full - footer = analysis + plan overhead)
    Seq("layout_overlap_depth", "layout_zorder_footer",
        "layout_hilbert_footer").foreach { q =>
      val fn = SparkEntry.queries(q)
      out(s"${q}_pass1") = time(s"$q 1")(noop(fn(spark, sfDir)))
      out(s"${q}_pass2") = time(s"$q 2")(noop(fn(spark, sfDir)))
    }
    val qs = out.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"probe":"layout_decomp","sf":"$sfDir","sec":$qs}""")
    spark.stop()
  }
}
