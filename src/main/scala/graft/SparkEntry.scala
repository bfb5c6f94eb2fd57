package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CurationQueries, EvalOpsQueries, GovernanceQueries, GraphLearnQueries, IncrementalQueries, IrLakeQueries, MefStarQueries, OlapQueries, ParityQueries, PipelineQueries, QualityDriftQueries, QueryDef, SelectionEmbedQueries, SketchStatsQueries, TimeSeriesQueries, TrainingMixQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the engine's verifiable capabilities; each
  * module contributes `Map[String, QueryDef]` entries (DataFrame plan +
  * optional DuckDB-oracle SQL twin over the same parquet tables).
  */
object SparkEntry {

  private def allDefs: Map[String, QueryDef] =
    ParityQueries.defs ++ PipelineQueries.defs ++ MefStarQueries.defs ++
      OlapQueries.defs ++ IncrementalQueries.defs ++ CurationQueries.defs ++
      TrainingMixQueries.defs ++ SketchStatsQueries.defs ++
      GovernanceQueries.defs ++ GraphLearnQueries.defs ++ IrLakeQueries.defs ++
      TimeSeriesQueries.defs ++ QualityDriftQueries.defs ++
      SelectionEmbedQueries.defs ++ EvalOpsQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs("monthly_star_rollup").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
