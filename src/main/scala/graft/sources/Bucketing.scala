package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Hash-bucketed (and per-bucket sorted) tables — the engine's analog
  * of the reference's secondary indexes on the fact FKs
  * (`sql/CreacionDeDataWareHouse.sql:141-145`, SURVEY §2.11): pay one
  * hash-clustering pass at WRITE time so that every later join or
  * aggregation on the bucket key plans with NO shuffle exchange — the
  * scan itself reports `HashPartitioning(bucketCols, n)` and
  * `EnsureRequirements` finds the distribution already satisfied.
  *
  * At 100 TB this is the difference between re-shuffling the fact
  * table on every query and never shuffling it again: a fact bucketed
  * by its join key turns fact⋈dim-bridge / fact⋈fact joins into
  * zipped per-bucket merges, and `sortBy` additionally pre-sorts each
  * bucket file so sort-merge joins skip their SortExec too.
  *
  * Mechanics that make the layout actually hold:
  *  - one FILE per bucket: the frame is repartitioned into `nBuckets`
  *    partitions on the bucket columns before writing. Spark's bucket
  *    id is `pmod(murmur3(cols), n)` — the same function
  *    `repartition(n, cols)` uses — so each task holds exactly one
  *    bucket and writes exactly one file. Without this, every task
  *    writes up to `nBuckets` files (task×bucket small-file blowup)
  *    and multi-file buckets forfeit the sorted-scan guarantee.
  *  - mismatched bucket counts still avoid the shuffle when one count
  *    divides the other and
  *    `spark.sql.bucketing.coalesceBucketsInJoin.enabled` is set: the
  *    finer side's buckets are read coalesced to the coarser count.
  *
  * Bucketed data must be written through the catalog (`saveAsTable`);
  * `option("path", …)` keeps the bytes in the caller's directory with
  * only the table metadata (schema + bucket spec) in the catalog.
  */
object Bucketing {

  /** Write `df` as bucketed parquet table `table` at `path`, one file
    * per bucket, each bucket sorted by `sortCols` (default: the bucket
    * columns themselves).
    */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      nBuckets: Int, bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    df.repartition(nBuckets, bucketCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (scan reports the bucket layout as its
    * output partitioning/ordering).
    */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
