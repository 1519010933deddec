package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Exprs.{sumDec, sumDecSql}

/** Pivot, JSON extraction, tokenize/explode, set ops, exact distinct
  * (SURVEY.md §2 #19, #22-25).
  */
object SemiStructured {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** #19 pivot event_type -> count columns per user. Pivot values are
    * pinned (no extra distinct pass to discover them) and missing cells
    * are zero-filled to match the oracle's `FILTER` counts.
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .count()
      .na.fill(0L, eventTypes)
      .orderBy("user_id")

  val pivotEventsSql: String = {
    val cols = eventTypes.map(t =>
      s"  COUNT(*) FILTER (WHERE event_type = '$t') AS \"$t\"").mkString(",\n")
    s"""SELECT user_id,
       |$cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** #22 JSON field extraction from events.props + group rollup. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sumDec(col("value"), 18, 2).as("sum_value"))
      .orderBy("k")

  val jsonExtractSql: String =
    s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
       |  COUNT(*) AS n,
       |  ${sumDecSql("value", 18, 2)} AS sum_value
       |FROM events GROUP BY k ORDER BY k""".stripMargin

  /** #23 tokenize + explode + global token frequency (top 50). */
  def explodeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(50)

  val explodeTokensSql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin

  /** #24 UNION / INTERSECT / EXCEPT over the order-customer and
    * event-user key sets, tagged into one result.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val oc = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("k")).distinct()
    val ec = Tables.eventsUs(spark, dir)
      .select(col("user_id").as("k")).distinct()
    val u = oc.union(ec).distinct().withColumn("op", lit("union"))
    val i = oc.intersect(ec).withColumn("op", lit("intersect"))
    val x = oc.except(ec).withColumn("op", lit("except"))
    u.unionByName(i).unionByName(x).select("op", "k").orderBy("op", "k")
  }

  val setOpsSql: String =
    """WITH oc AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |ec AS (SELECT DISTINCT user_id AS k FROM events)
      |SELECT 'union' AS op, k FROM (SELECT k FROM oc UNION SELECT k FROM ec)
      |UNION ALL
      |SELECT 'intersect' AS op, k FROM (SELECT k FROM oc INTERSECT SELECT k FROM ec)
      |UNION ALL
      |SELECT 'except' AS op, k FROM (SELECT k FROM oc EXCEPT SELECT k FROM ec)
      |ORDER BY op, k""".stripMargin

  /** #25 exact multi-column distinct count per group (no approx). */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(spark, dir)
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .distinct()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  val distinctUsersSql: String =
    """SELECT event_type, COUNT(*) AS n
      |FROM (SELECT DISTINCT event_type, user_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pivot_events" -> (pivotEvents _),
    "json_extract" -> (jsonExtract _),
    "explode_tokens" -> (explodeTokens _),
    "set_ops" -> (setOps _),
    "distinct_users" -> (distinctUsers _))

  val oracles: Map[String, String] = Map(
    "pivot_events" -> pivotEventsSql,
    "json_extract" -> jsonExtractSql,
    "explode_tokens" -> explodeTokensSql,
    "set_ops" -> setOpsSql,
    "distinct_users" -> distinctUsersSql)
}
