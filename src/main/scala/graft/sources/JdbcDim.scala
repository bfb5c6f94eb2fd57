package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4 — JDBC dimension scan (`etl/cargar_postgres.py:116-124`, the
  * loader's `pd.read_sql` dim-cache refresh).
  *
  * The engine-native mapping keeps dims as broadcast DataFrames built
  * from the fact stream ([[graft.mef.Star.buildDim]]); this source is
  * the complementary path for dims that LIVE in an operational RDBMS:
  * read over JDBC into a DataFrame, then broadcast into FK joins like
  * any other dim. Bounded dims (the reference's ejecutora/sector
  * tables: thousands of rows) read through one connection; a dim too
  * large for that takes the partitioned overload, which turns the scan
  * into `numPartitions` range-predicated queries executed by separate
  * tasks — Spark's JDBC relation pushes the per-partition bounds and
  * any later filters into the remote SQL, so the database does the
  * pruning, not the cluster.
  */
object JdbcDim {

  /** Single-connection read — the right call for bounded dims. */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new Properties)

  /** Range-partitioned read for dims past single-connection size:
    * `numPartitions` tasks each issue a bounded query on
    * `partitionColumn` (must be numeric, indexed at the source for the
    * pushdown to matter).
    */
  def readPartitioned(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(
      url, table, partitionColumn, lowerBound, upperBound, numPartitions,
      new Properties)
}
