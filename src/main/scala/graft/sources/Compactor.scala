package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Small-file compaction — the 100 TB housekeeping operator. Streaming
  * micro-batches, per-executor writes, and incremental loads leave
  * thousands of KB-sized files per partition; every downstream scan
  * then pays a task + footer read per file, and the NameNode/listing
  * layer pays per object. Compaction rewrites a dataset to
  * ≈ `targetBytes` files.
  *
  * File count = ceil(inputBytes / targetBytes), measured from the
  * files themselves (`inputFiles` sizes — no full-data count job).
  * The rewrite is one shuffle-free coalesce when shrinking the file
  * count (the common case) and a round-robin repartition when growing
  * it (splitting a few huge files — there a shuffle is the point:
  * parallelism).
  */
object Compactor {

  /** Number of output files targeting `targetBytes` each, from the
    * dataset's current on-disk footprint.
    */
  def plannedFileCount(df: DataFrame, targetBytes: Long): Int = {
    require(targetBytes > 0)
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val bytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
  }

  /** Rewrite `df` (a file-backed frame) to `out` at ≈targetBytes/file. */
  def compact(df: DataFrame, out: String, targetBytes: Long): Unit = {
    val n = plannedFileCount(df, targetBytes)
    val current = df.rdd.getNumPartitions
    val sized =
      if (n <= current) df.coalesce(n) // narrow: no shuffle
      else df.repartition(n)           // widening IS the parallelism fix
    sized.write.mode(SaveMode.Overwrite).parquet(out)
  }
}
