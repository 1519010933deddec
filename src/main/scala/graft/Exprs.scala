package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic expression helpers.
  *
  * The driver hash-compares our parquet dumps against DuckDB running the
  * same SQL, so floating-point aggregation must be bit-identical across
  * engines. IEEE double addition is order-sensitive and Spark/DuckDB sum
  * in different orders; casting each addend to DECIMAL first makes the
  * sum exact (decimal arithmetic is associative), and the final
  * decimal->double cast rounds the same exact value on both sides.
  * Decimal-cast rounding itself can't tie-break differently: decimal
  * boundaries at half-scale (e.g. x.005) are not dyadic rationals, so a
  * double operand is never exactly on a boundary.
  */
object Exprs {

  /** Exact sum of a double column: decimal-cast each value, sum, cast back. */
  def sumDec(e: Column, prec: Int, scale: Int): Column =
    sum(e.cast(DecimalType(prec, scale))).cast("double")

  /** SQL mirror of [[sumDec]] for the DuckDB oracle. */
  def sumDecSql(sqlExpr: String, prec: Int, scale: Int): String =
    s"CAST(SUM(CAST($sqlExpr AS DECIMAL($prec,$scale))) AS DOUBLE)"

  /** Cross-engine-deterministic 4dp rounding: ROUND() half-boundary
    * behavior differs between Spark (exact HALF_UP on the binary value)
    * and DuckDB, so a value landing on x.xxxx5 can round apart. floor(x
    * * 1e4 + 0.5) / 1e4 is pure IEEE arithmetic — bit-identical wherever
    * both engines evaluate it.
    */
  def r4(e: Column): Column =
    floor(e * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** SQL mirror of [[r4]] for the DuckDB oracle. */
  def r4Sql(sqlExpr: String): String =
    s"FLOOR(($sqlExpr) * 10000.0 + 0.5) / 10000.0"
}
