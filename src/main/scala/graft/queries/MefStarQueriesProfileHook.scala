package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exposes the private synthetic-raw builder to the profiling main. */
object MefStarQueriesProfileHook {
  def syntheticRaw(s: SparkSession, dir: String): DataFrame =
    MefStarQueries.syntheticRaw(s, dir)
}
