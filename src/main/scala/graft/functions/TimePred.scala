package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sargable time predicates.
  *
  * `year(ts) = 1997 AND month(ts) BETWEEN 1 AND 6` is correct but
  * opaque to the parquet reader — function calls never reach
  * PushedFilters, so every row group is read and decoded. The
  * equivalent half-open range on the raw column DOES push down,
  * enabling row-group min/max skipping — on a 100 TB time-ordered
  * fact that's the difference between scanning one year and scanning
  * everything. The two forms are semantically identical for non-null
  * timestamps (null fails both).
  */
object TimePred {

  private def tsLit(year: Int, month: Int): Column =
    to_timestamp_ntz(lit(f"$year-$month%02d-01 00:00:00"))

  /** ts within [year-m1-01, year-(m2+1)-01) — YTD-style cutoff. */
  def inYearMonths(ts: Column, year: Int, m1: Int, m2: Int): Column = {
    val (endY, endM) = if (m2 >= 12) (year + 1, 1) else (year, m2 + 1)
    ts >= tsLit(year, m1) && ts < tsLit(endY, endM)
  }

  /** ts within calendar years [y1, y2]. */
  def inYears(ts: Column, y1: Int, y2: Int): Column =
    ts >= tsLit(y1, 1) && ts < tsLit(y2 + 1, 1)

  def inYear(ts: Column, y: Int): Column = inYears(ts, y, y)
}
