package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a DataFrame query over a testdata
  * directory plus (when SQL-expressible) an ANSI-SQL twin the driver runs
  * in DuckDB over the same parquet tables. Column names/aliases MUST match
  * between the two — the driver's compare sorts columns by name before
  * hashing values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(fn, Some(sql))
}
