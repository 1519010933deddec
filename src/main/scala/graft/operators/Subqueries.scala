package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Exprs.{r4, r4Sql, sumDec, sumDecSql}

/** TPC-H subquery/decorrelation shapes (SURVEY.md §2 #124-129).
  *
  * The reference's catalog consumers issue exactly these query shapes
  * against indexed products (files-per-job distributions, best-in-group
  * lookups, "jobs with X but never Y" audits — reactor.py:119-218's
  * collections); what's exercised here is the DECORRELATED plan form
  * each of them should compile to at scale: correlated scalar
  * subqueries become per-group aggregates joined back (one keyed
  * shuffle instead of a subquery per row), EXISTS/NOT EXISTS become
  * semi/anti joins, and scalar global aggregates become 1-row
  * broadcast cross joins, never driver round-trips.
  */
object Subqueries {

  private val revenueCol = sumDec(
    col("l_extendedprice") * (lit(1) - col("l_discount")), 22, 6)
  private val revenueSql =
    sumDecSql("l_extendedprice*(1-l_discount)", 22, 6)

  // ---------------------------------------------------------------- #124
  /** #124 TPC-H Q9 shape: profit by (nation, ship-year) with a LIKE
    * filter on the part dim. No partsupp table in this schema, so unit
    * cost is modeled as 0.5·p_retailprice — the plan shape (fact ⋈ two
    * sized dims ⋈ broadcast nation, LIKE pushed to the part scan,
    * grouped decimal-exact profit) is the Q9 one. part/supplier join
    * ordering is left to Catalyst+AQE: at catalog scale part is
    * fact-sized (shuffle join) while nation stays broadcast.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
      .where(col("p_name").like("%widget%"))
      .select("p_partkey", "p_retailprice")
    val s = Tables(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
    val amount = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      lit(0.5) * col("p_retailprice") * col("l_quantity")
    Tables(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_quantity", "l_shipdate")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).as("o_year"))
      .agg(sumDec(amount, 24, 6).as("profit"))
      .orderBy(col("nation"), desc("o_year"))
  }

  val q9Sql: String =
    s"""SELECT n_name AS nation, year(l_shipdate) AS o_year,
       |  ${sumDecSql(
             "l_extendedprice*(1-l_discount) - 0.5*p_retailprice*l_quantity",
             24, 6)} AS profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------- #125
  /** #125 TPC-H Q13 shape: customer distribution by order count — the
    * canonical LEFT OUTER JOIN + double aggregation. The join carries
    * the priority predicate IN the join condition (not a WHERE, which
    * would turn the outer join inner); zero-order customers survive as
    * NULL rows and count(o_orderkey) ignores exactly those. Two keyed
    * shuffles: c_custkey (outer-join + first agg share one) then the
    * tiny c_count regroup.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").select("c_custkey")
    val o = Tables(spark, dir, "orders")
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- #126
  /** #126 TPC-H Q15 shape: supplier(s) with the maximum quarterly
    * revenue. The correlated "= (SELECT max(...))" decorrelates into a
    * 1-row global max cross-joined (broadcast by construction) against
    * the per-supplier revenue aggregate — no second scan of lineitem,
    * no driver round-trip. Revenue is decimal-exact, so the max
    * equality can't drift cross-engine.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables(spark, dir, "lineitem")
      .where(expr(
        "l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(revenueCol.as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
    val s = Tables(spark, dir, "supplier").select("s_suppkey", "s_name")
    rev.join(broadcast(top), col("total_revenue") === col("max_revenue"))
      .join(s, col("supplier_no") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no, $revenueSql AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- #127
  /** #127 TPC-H Q17 shape: revenue lost to small-quantity orders — a
    * correlated per-part scalar average decorrelated into a keyed agg
    * joined back to the fact. The `l_quantity < 0.2·avg(quantity)`
    * comparison is made engine-exact by clearing the division:
    * 5·n·l_quantity < sum_qty, all terms integral (quantities are
    * whole numbers) and far below 2^53, so the double compare is exact
    * on both engines. One IEEE division at the end under r4.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
      .where(col("p_brand") === "Brand#11")
      .select("p_partkey")
    val l = Tables(spark, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val perPart = l
      .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("agg_partkey"))
      .agg(sumDec(col("l_quantity"), 18, 2).as("sum_qty"),
        count(lit(1)).as("n_lines"))
    l.join(perPart, col("l_partkey") === col("agg_partkey"))
      .where(col("l_quantity") * lit(5) * col("n_lines") < col("sum_qty"))
      .agg(sumDec(col("l_extendedprice"), 18, 2).as("small_qty_revenue"),
        count(lit(1)).as("n_small"))
      .select(col("small_qty_revenue"), col("n_small"),
        r4(col("small_qty_revenue") / lit(7.0)).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""WITH agg AS (
       |  SELECT l_partkey AS agg_partkey,
       |    ${sumDecSql("l_quantity", 18, 2)} AS sum_qty,
       |    COUNT(*) AS n_lines
       |  FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part
       |    WHERE p_brand = 'Brand#11')
       |  GROUP BY l_partkey)
       |SELECT ${sumDecSql("l_extendedprice", 18, 2)} AS small_qty_revenue,
       |  COUNT(*) AS n_small,
       |  ${r4Sql(s"${sumDecSql("l_extendedprice", 18, 2)} / 7.0")}
       |    AS avg_yearly
       |FROM lineitem JOIN agg ON l_partkey = agg_partkey
       |WHERE l_quantity * 5 * n_lines < sum_qty""".stripMargin

  // ---------------------------------------------------------------- #128
  /** #128 TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    * a finished multi-supplier order. "Late" is l_shipdate more than 60
    * days past o_orderdate (this schema has no receipt/commit dates).
    * EXISTS(other supplier on the order) is a semi-join against the
    * slim (orderkey, suppkey) projection; NOT EXISTS(other LATE
    * supplier) is an anti-join against the already-computed late set
    * reused under a second alias — the correlated predicates never
    * re-scan lineitem per row.
    */
  def q21BlameSupplier(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val o = Tables(spark, dir, "orders")
      .where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val late = l.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("l_orderkey", "l_suppkey")
    val others = l.select(col("l_orderkey").as("o2_orderkey"),
      col("l_suppkey").as("o2_suppkey"))
    val lateOthers = late.select(col("l_orderkey").as("o3_orderkey"),
      col("l_suppkey").as("o3_suppkey"))
    val s = Tables(spark, dir, "supplier").select("s_suppkey", "s_name")
    late
      .join(others, col("o2_orderkey") === col("l_orderkey") &&
        col("o2_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(lateOthers, col("o3_orderkey") === col("l_orderkey") &&
        col("o3_suppkey") =!= col("l_suppkey"), "left_anti")
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
  }

  val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  // ---------------------------------------------------------------- #129
  /** #129 TPC-H Q22 shape: well-funded customers with no activity —
    * a global scalar threshold plus NOT EXISTS. The global average
    * over positive balances decorrelates to a 1-row (sum, n) aggregate
    * broadcast-cross-joined into the filter (the division is one IEEE
    * op on decimal-exact inputs, identical both engines); inactivity
    * is an anti-join against the event log (every customer has orders
    * in this data, so the audit runs against events — same anti
    * shape as reference catalog "indexed but never accessed" audits).
    */
  def q22SalesOpp(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val thr = c.where(col("c_acctbal") > 0)
      .agg((sumDec(col("c_acctbal"), 18, 2) / count(lit(1)))
        .as("avg_positive"))
    val e = Tables.eventsUs(spark, dir).select("user_id")
    c.join(broadcast(thr))
      .where(col("c_acctbal") > col("avg_positive"))
      .join(e, col("c_custkey") === col("user_id"), "left_anti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"),
        sumDec(col("c_acctbal"), 18, 2).as("totacctbal"))
      .orderBy("cntry")
  }

  val q22Sql: String =
    s"""SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
       |  ${sumDecSql("c_acctbal", 18, 2)} AS totacctbal
       |FROM customer
       |WHERE c_acctbal > (
       |    SELECT ${sumDecSql("c_acctbal", 18, 2)} / COUNT(*)
       |    FROM customer WHERE c_acctbal > 0)
       |  AND NOT EXISTS (SELECT 1 FROM events
       |    WHERE user_id = c_custkey)
       |GROUP BY c_nationkey
       |ORDER BY cntry""".stripMargin

  // ---------------------------------------------------------------- #146
  /** #146 TPC-H Q20 shape: suppliers who stock a 'widget' part heavily
    * — the nested-EXISTS chain (supplier ⟵ semi ⟵ heavy (supp, part)
    * lines ⟵ semi ⟵ LIKE-filtered parts) decorrelated into one keyed
    * aggregate + two semi-joins. No partsupp table in this schema, so
    * "heavily" is a shipped-quantity floor over 1996 lineitems; the
    * quantity compare stays decimal-exact. The inner (suppkey,
    * partkey) aggregate is the only shuffle; both semi-joins carry
    * slim projections.
    */
  def q20HeavySuppliers(spark: SparkSession, dir: String,
      minQty: Int = 60): DataFrame = {
    val p = Tables(spark, dir, "part")
      .where(col("p_name").like("%widget%"))
      .select("p_partkey")
    val heavy = Tables(spark, dir, "lineitem")
      .where(expr(
        "l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'"))
      .select("l_suppkey", "l_partkey", "l_quantity")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy("l_suppkey", "l_partkey")
      .agg(sumDec(col("l_quantity"), 18, 2).as("qty"))
      .where(col("qty") > minQty)
      .select("l_suppkey")
    Tables(spark, dir, "supplier")
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Parameter-matched oracle (same `minQty` as the operator). */
  def q20Sql(minQty: Int = 60): String =
    s"""SELECT s_suppkey, s_name FROM supplier
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part
       |      WHERE p_name LIKE '%widget%')
       |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY l_suppkey, l_partkey
       |  HAVING ${sumDecSql("l_quantity", 18, 2)} > $minQty)
       |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- #147
  /** #147 gaps-and-islands: each customer's order-day streaks. The
    * island key is the classic day − ROW_NUMBER() difference (constant
    * within a run of consecutive distinct days), so streaks fall out
    * of ONE per-customer window + one keyed agg — no self-join, no
    * iteration. Emits each customer's longest streak; pure integer
    * arithmetic end to end.
    */
  def windowStreaks(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables(spark, dir, "orders")
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).as("day"))
      .distinct()
    val w = Window.partitionBy("o_custkey").orderBy("day")
    val wBest = Window.partitionBy("o_custkey")
      .orderBy(desc("len"), desc("streak_start"))
    val wAll = Window.partitionBy("o_custkey")
    days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy("o_custkey", "island")
      .agg(count(lit(1)).as("len"), min(col("day")).as("streak_start"))
      .withColumn("n_streaks", count(lit(1)).over(wAll))
      .withColumn("rk", row_number().over(wBest))
      .where(col("rk") === 1)
      .select(col("o_custkey"), col("n_streaks"),
        col("len").as("longest_streak"),
        col("streak_start").as("longest_start"))
      .orderBy("o_custkey")
  }

  val windowStreaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT o_custkey,
      |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
      |      AS day
      |  FROM orders),
      |isl AS (
      |  SELECT o_custkey, day,
      |    day - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY day)
      |      AS island
      |  FROM days),
      |streaks AS (
      |  SELECT o_custkey, island, COUNT(*) AS len,
      |    MIN(day) AS streak_start
      |  FROM isl GROUP BY 1, 2),
      |ranked AS (
      |  SELECT o_custkey, len, streak_start,
      |    COUNT(*) OVER (PARTITION BY o_custkey) AS n_streaks,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY len DESC, streak_start DESC) AS rk
      |  FROM streaks)
      |SELECT o_custkey, n_streaks, len AS longest_streak,
      |  streak_start AS longest_start
      |FROM ranked WHERE rk = 1 ORDER BY o_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_heavy_suppliers" ->
      ((s: SparkSession, d: String) => q20HeavySuppliers(s, d)),
    "window_streaks" -> (windowStreaks _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q13_custdist" -> (q13CustDist _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q21_blame_supplier" -> (q21BlameSupplier _),
    "q22_sales_opp" -> (q22SalesOpp _))

  val oracles: Map[String, String] = Map(
    "q20_heavy_suppliers" -> q20Sql(),
    "window_streaks" -> windowStreaksSql,
    "q9_product_profit" -> q9Sql,
    "q13_custdist" -> q13Sql,
    "q15_top_supplier" -> q15Sql,
    "q17_small_quantity" -> q17Sql,
    "q21_blame_supplier" -> q21Sql,
    "q22_sales_opp" -> q22Sql)
}
