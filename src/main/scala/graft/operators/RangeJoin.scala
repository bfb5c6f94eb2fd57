package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested-loop: Spark plans a
  * plain `l.ts BETWEEN r.s AND r.e` as BroadcastNestedLoopJoin (O(N×M)
  * and OOM-prone once the interval side isn't tiny). The scalable
  * pattern buckets time: every interval is exploded to the buckets it
  * covers, points map to one bucket, and the join becomes an equi-join
  * on bucket + residual range filter. Work is O(points + intervals ×
  * avg_span/bucket + true matches) with one shuffle on the bucket key.
  */
object RangeJoin {

  /** Join point rows to every interval containing them.
    * `ptCol` (timestamp) ∈ [`startCol`, `endCol`) of `intervals`;
    * `bucketSeconds` should be ≳ the typical interval length.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    val b = lit(bucketSeconds)
    val pts = points.withColumn("_bucket", (unix_seconds(col(ptCol)) / b).cast("long"))
    val ivs = intervals.withColumn("_bucket",
      explode(sequence(
        (unix_seconds(col(startCol)) / b).cast("long"),
        // end is exclusive; a zero-length interval still covers its start bucket
        greatest(
          (unix_seconds(col(startCol)) / b).cast("long"),
          ((unix_seconds(col(endCol)) - 1) / b).cast("long")))))
    pts.join(ivs, Seq("_bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bucket")
  }
}
