package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact NTILE without a single-partition window.
  *
  * `ntile(k) OVER (ORDER BY …)` is the textbook decile/quantile-bucket
  * operator, but Spark plans an empty-partition window as ONE task
  * holding every row — a non-starter at 100 TB. This operator computes
  * the identical assignment from a distributed dense rank:
  *
  *  1. [[DenseId.withDenseId]] assigns rank = row_number over the sort
  *     key via range-repartition + zipWithIndex (no global window, no
  *     single-task sort);
  *  2. the total row count N arrives as `max(rank)` — a 1-row
  *     aggregate cross-joined back (broadcast, SURVEY.md §2.3 J9's
  *     shape);
  *  3. SQL NTILE arithmetic in closed form: with q = N div k,
  *     r = N mod k, the first r tiles hold q+1 rows each and the rest
  *     hold q — pure integer expressions, map-side.
  *
  * The sort key must be a total order (pass tiebreakers) or tile
  * membership at bucket boundaries is partition-layout-dependent.
  */
object ExactNtile {

  /** Append `tileCol` = NTILE(`tiles`) in `sortCols` order (1-based). */
  def withNtile(df: DataFrame, sortCols: Seq[Column], tiles: Int, tileCol: String): DataFrame = {
    require(tiles > 0, "tiles must be positive")
    val ranked = DenseId.withDenseId(df, sortCols, "__rank")
    val total = ranked.agg(max(col("__rank")).as("__n"))
    ranked.crossJoin(broadcast(total))
      .withColumn("__q", expr(s"__n div $tiles"))
      .withColumn("__r", col("__n") % tiles)
      .withColumn(
        tileCol,
        when(col("__rank") <= col("__r") * (col("__q") + 1),
          expr("(__rank - 1) div (__q + 1)") + 1)
          .otherwise(
            col("__r") + expr("(__rank - __r * (__q + 1) - 1) div __q") + 1)
          .cast("int"))
      .drop("__q", "__r", "__n", "__rank")
  }
}
