package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level pushdown assertions: the scan-reduction claims PLANS.md
  * makes must hold in the actual physical plans, not just in prose.
  * Scans are inspected via FileSourceScanExec metadata (the rendered
  * plan string truncates PushedFilters).
  */
class PushdownSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  /** (PushedFilters, ReadSchema) per parquet scan in the plan.
    * `sparkPlan` (pre-AQE) — AdaptiveSparkPlanExec hides its subtree
    * from collect() until execution.
    */
  private def scans(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec =>
        (s.metadata.getOrElse("PushedFilters", ""),
          s.metadata.getOrElse("ReadSchema", ""))
    }

  test("q19: superset prefilters reach BOTH parquet scans") {
    val ss = scans(operators.Relational.q19Disjunctive(spark, sf))
    val part = ss.find(_._2.contains("p_brand"))
      .getOrElse(fail(s"no part scan in $ss"))
    assert(part._1.contains("In(p_brand"),
      s"p_brand IN-list not pushed: ${part._1}")
    assert(part._1.contains("GreaterThanOrEqual(p_size,1)") &&
      part._1.contains("LessThanOrEqual(p_size,15)"),
      s"p_size range not pushed: ${part._1}")
    val li = ss.find(_._2.contains("l_quantity"))
      .getOrElse(fail(s"no lineitem scan in $ss"))
    assert(li._1.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      li._1.contains("LessThanOrEqual(l_quantity,30.0)"),
      s"l_quantity range not pushed: ${li._1}")
  }

  test("q1: date filter pushed and scan pruned to needed columns") {
    val ss = scans(operators.Relational.q1PricingSummary(spark, sf))
    assert(ss.head._1.contains("LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed: ${ss.head._1}")
    assert(!ss.head._2.contains("l_orderkey"),
      s"scan reads l_orderkey which q1 never uses: ${ss.head._2}")
  }

  test("q10: returnflag equality pushed to the lineitem scan") {
    val ss = scans(operators.Relational.q10ReturnedItems(spark, sf))
    assert(ss.exists(_._1.contains("EqualTo(l_returnflag,R)")),
      s"l_returnflag = 'R' not pushed: $ss")
  }
}
