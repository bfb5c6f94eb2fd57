package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks the most recent right row
  * with `right.ts <= left.ts` within the same key — the
  * time-series/event enrichment join Spark lacks natively.
  *
  * Implementation is the union + carry-forward pattern (compose
  * built-ins before writing a custom exec — SURVEY.md §7.3 preference
  * order):
  *   1. tag and union both sides (right rows carry their payload,
  *      left rows null),
  *   2. one window per key ordered by (ts, side) with
  *      `last(payload, ignoreNulls)` carrying the latest right payload
  *      forward,
  *   3. keep left rows.
  *
  * ONE shuffle on the key, no range join, no per-key sort beyond the
  * window's — at 100 TB this is a single exchange of left+right with
  * linear scan per key. Right rows sort before left rows at equal ts
  * (side flag 0 < 1) so ties are inclusive, matching ASOF `>=`.
  */
object AsOfJoin {

  /** left ⟕asof right on `keyCol`, backward over `tsCol`; the right
    * columns in `payloadCols` are appended (null when no prior right
    * row exists).
    */
  def backward(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val collisions = payloadCols.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"payload column(s) ${collisions.mkString(", ")} collide with left columns — " +
        "alias the right-side payload before joining")
    val payload = struct(payloadCols.map(col): _*)

    val taggedRight = right.select(
      (Seq(col(keyCol), col(tsCol), lit(0).as("_side"), payload.as("_p")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("_side"),
        lit(null).cast(taggedRight.schema("_p").dataType).as("_p")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("_carried", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"_carried.$c").as(c)): _*)
  }
}
