package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exposes the private synthetic-raw builder to the profiling main. */
object MefStarQueriesProfileHook {
  def syntheticRaw(s: SparkSession, dir: String): DataFrame =
    MefStarQueries.syntheticRaw(s, dir)

  /** Same, over a caller-supplied lineitem frame — lets the skew-stress
    * spec feed a hot-key-remapped slice through the identical pipeline.
    */
  def syntheticRawFrom(li: DataFrame, s: SparkSession, dir: String): DataFrame =
    MefStarQueries.syntheticRawFrom(li, s, dir)
}
