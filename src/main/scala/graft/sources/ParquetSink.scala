package graft.sources

import org.apache.spark.sql.DataFrame

/** S2 — Parquet sink with the reference's idempotency contract
  * (`etl/transformar_mensual.py:119-123`): skip-if-exists unless
  * overwrite. At scale, output is partitioned by year (`ANO_EJE`) so
  * downstream year-predicate queries prune whole partitions —
  * the Spark analog of the reference's per-year files + fact indexes
  * (SURVEY.md §4).
  */
object ParquetSink {

  /** zstd: ~30% smaller than snappy at similar scan speed — at 100 TB
    * the storage/IO saving dominates the marginal encode cost.
    */
  def writeYearly(
      df: DataFrame, outPath: String, overwrite: Boolean = false,
      codec: String = "zstd"): Unit =
    writePartitioned(df, outPath, "ANO_EJE", overwrite, codec)

  /** Hive-layout partitioned write on an arbitrary column — the
    * warehouse fact layout (year/date partitions) that makes static
    * AND dynamic partition pruning possible on the read side.
    */
  def writePartitioned(
      df: DataFrame, outPath: String, partCol: String,
      overwrite: Boolean = false, codec: String = "zstd"): Unit =
    df.write
      .mode(if (overwrite) "overwrite" else "ignore")
      .option("compression", codec)
      .partitionBy(partCol)
      .parquet(outPath)

  def write(
      df: DataFrame, outPath: String, overwrite: Boolean = false,
      codec: String = "zstd"): Unit =
    df.write
      .mode(if (overwrite) "overwrite" else "ignore")
      .option("compression", codec)
      .parquet(outPath)
}
