package graft
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession(appName = "explain-probe")
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
        .explain("formatted")
    }
    spark.stop()
  }
}
