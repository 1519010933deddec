package graft

import org.apache.spark.sql.SparkSession

/** Scratch entry for local experiments (not part of the driver contract). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
    println(s"== events: ${ev.count()}")
    ev.printSchema()
    ev.show(3, false)
    val emb = Tables(spark, dir, "embeddings")
    import org.apache.spark.sql.functions._
    emb.select(size(col("embedding")).as("dim")).groupBy("dim").count().show()
    ev.selectExpr("min(user_id)", "max(user_id)", "min(ts)", "max(ts)").show(false)
    Tables(spark, dir, "documents").selectExpr("min(n_chars)", "max(n_chars)", "max(length(text))").show(false)
    spark.stop()
  }
}
