package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Piecewise timing for agg_spearman (r13 evidence tooling, same
  * family as SpillProbe/ScaleProbe): times each subtree to the noop
  * sink, twice, min reported. Measured decomposition at sf0.1 / 32
  * threads: scan 0.30, (flag,y) group 1.17, x rank map 0.51, y-partial
  * + broadcast attach 1.65, + rank window 2.77, full query 4.70 — the
  * cost is stage plumbing over the ~near-unique price domain, not the
  * moment arithmetic (the r12 decimal lanes were already off the
  * row path).
  */
object SpearProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession(appName = "spear-probe")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t2(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.setJobDescription(label)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s ${times.min}%.3f  (p1 ${times.head}%.3f)")
    }
    def li = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").as("x"),
        col("l_extendedprice").as("y"))
    t2("scan_only")(li)
    t2("groupby_flag_y")(li.groupBy("l_returnflag", "y")
      .agg(count(lit(1)).as("t")))
    def xm = li.groupBy(col("l_returnflag"), col("x"))
      .agg(count(lit(1)).as("t"))
      .withColumn("cum", sum("t").over(
        Window.partitionBy("l_returnflag").orderBy("x")))
      .select(col("l_returnflag"), col("x"), col("t"),
        (col("cum") * 2L - col("t") + 1L).as("rx"))
    t2("xm")(xm)
    t2("ym_grouponly")(li.join(Tables.maybeBroadcast(
        xm.select(col("l_returnflag"), col("x"), col("rx"))),
        Seq("l_returnflag", "x"))
      .groupBy(col("l_returnflag"), col("y"))
      .agg(count(lit(1)).as("t"), sum(col("rx")).as("srx")))
    t2("ym_with_window")(li.join(Tables.maybeBroadcast(
        xm.select(col("l_returnflag"), col("x"), col("rx"))),
        Seq("l_returnflag", "x"))
      .groupBy(col("l_returnflag"), col("y"))
      .agg(count(lit(1)).as("t"), sum(col("rx")).as("srx"))
      .withColumn("cum", sum("t").over(
        Window.partitionBy("l_returnflag").orderBy("y")))
      .withColumn("ry", col("cum") * 2L - col("t") + 1L))
    t2("full")(SparkEntry.queries("agg_spearman")(spark, dir))
    spark.stop()
  }
}
