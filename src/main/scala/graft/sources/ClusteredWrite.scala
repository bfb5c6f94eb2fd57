package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Range-clustered writes — the scan-pruning half of write-time layout
  * ([[Bucketing]] is the join half). `repartitionByRange` on the
  * cluster key gives files DISJOINT key ranges; `sortWithinPartitions`
  * additionally orders rows inside each file so parquet row-group
  * min/max stats are tight. A later range predicate on that key
  * (pushed by Catalyst, or rewritten to sargable form by
  * [[graft.plans.SargableTimeRewrite]]) then skips whole files and
  * row groups at the footer level instead of decoding them — at
  * 100 TB, a one-month query over a decade of data reads ~1/120th of
  * the bytes ONLY if the layout clusters by time.
  *
  * This is the engine's analog of the reference's raw-table indexes
  * (`sql/CreacionDBOrigen.sql:140-153`) for scan-shaped access: a
  * btree on `ano_eje/mes_eje` serves point lookups in Postgres; a
  * time-clustered parquet layout serves the same predicates with
  * footer-stat pruning.
  *
  * Sampling note: `repartitionByRange` determines split points by
  * sampling the key column (one extra pass over the key only); the
  * resulting skew tolerance is what AQE's coalescing handles on read.
  */
object ClusteredWrite {

  /** Write `df` to `out` as `nFiles` parquet files clustered (range-
    * partitioned + internally sorted) on `clusterCols`.
    */
  def write(df: DataFrame, out: String, nFiles: Int, clusterCols: Seq[String]): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must be non-empty")
    val cols = clusterCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(out)
  }

  /** Z-ordered write: cluster files on the Morton interleave of two
    * quantized coordinates ([[graft.functions.ZOrder]]) so BOTH
    * columns get tight per-file min/max footer stats — a predicate on
    * either dimension (or a 2-D box) skips most files, where 1-D
    * range clustering serves only its own key. `xExpr`/`yExpr` must
    * already be quantized into [0, 65536).
    */
  def writeZOrdered(
      df: DataFrame, out: String, nFiles: Int,
      xExpr: org.apache.spark.sql.Column, yExpr: org.apache.spark.sql.Column): Unit = {
    val keyed = df.withColumn("_z", graft.functions.ZOrder.interleave16(xExpr, yExpr))
    keyed.repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(out)
  }

  /** Per-file (min, max) of `keyCol` for a parquet dataset — the
    * pruning evidence: after [[write]], ranges are pairwise disjoint,
    * so any range predicate overlaps few files. Reads each file's
    * column once (test/audit utility, not a hot path).
    */
  def fileRanges(
      spark: org.apache.spark.sql.SparkSession,
      path: String, keyCol: String): Seq[(String, String, String)] = {
    val files = spark.read.parquet(path).inputFiles.sorted
    files.toSeq.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(keyCol)).cast("string"), max(col(keyCol)).cast("string"))
        .head()
      (f, r.getString(0), r.getString(1))
    }
  }
}
