package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic aggregation helpers.
  *
  * The reference carries money as float64 end-to-end but declares
  * NUMERIC(20,2) intent (SURVEY.md §1.2, §7.4.8:
  * `sql/CreacionDBOrigen.sql:65-71`). For cross-engine (Spark vs DuckDB
  * oracle) hash-exact comparison we sum in decimal — decimal addition is
  * associative and exact, so the result is independent of partitioning
  * and evaluation order — then convert the final scalar to double.
  *
  * The double↔decimal round trips are deterministic across engines as
  * long as the unscaled decimal value stays below 2^53 (all test scales
  * qualify by orders of magnitude): the per-row cast rounds
  * half-away-from-zero in both engines, and the final decimal→double
  * conversion is a correctly-rounded single operation.
  *
  * DuckDB oracle twin for `decSum(c, s)`:
  *   `CAST(SUM(CAST(c AS DECIMAL(20,s))) AS DOUBLE)`
  */
object Money {
  /** Order-insensitive exact sum of a double column, returned as double.
    * `scale` must cover the true decimal scale of the input values
    * (2 for raw money, 4 for price*(1±rate) products) so the per-row
    * decimal cast is lossless.
    */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(20, scale))).cast("double")

  /** SQL fragment twin of [[decSum]] for the DuckDB oracle. */
  def decSumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(20,$scale))) AS DOUBLE)"
}
