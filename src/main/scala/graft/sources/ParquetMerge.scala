package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch MERGE/upsert into a parquet target — the engine-native
  * replacement for the reference's `INSERT ... ON CONFLICT DO NOTHING`
  * plus its re-run idempotency (`etl/cargar_postgres.py:135,248`),
  * extended to update semantics: last write wins per key.
  *
  * Plan shape: updates dedup by key (keep the `tieBreak`-greatest row
  * when given, else any deterministic arbitrary row via a max-struct),
  * target rows anti-join the update keys (one shuffle), union, write.
  * The rewrite is full-target here (parquet has no row-level update);
  * at scale the same operator runs per partition directory — only
  * partitions containing updated keys rewrite (partition pruning on
  * the update key range).
  *
  * The write lands in a `_tmp` sibling first and swaps via rename, so
  * a failed job never leaves a half-written target (the reference gets
  * this from transactions; files get it from atomic rename).
  */
object ParquetMerge {

  def upsert(
      spark: SparkSession, targetPath: String, updates: DataFrame,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "keys required")
    val cols = updates.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    val dedupedUpdates =
      if (nonKeys.isEmpty) updates.dropDuplicates(keys)
      else updates
        .groupBy(keys.map(col): _*)
        .agg(max(struct(nonKeys.map(col): _*)).as("_r"))
        .select(keys.map(col) ++ nonKeys.map(c => col(s"_r.$c").as(c)): _*)
        .select(cols.map(col): _*)

    val targetExists = recoverTarget(spark, targetPath)
    val merged =
      if (!targetExists) dedupedUpdates
      else spark.read.parquet(targetPath)
        .join(dedupedUpdates.select(keys.map(col): _*), keys, "left_anti")
        .select(cols.map(col): _*)
        .unionByName(dedupedUpdates)
    swapWrite(spark, targetPath, merged, targetExists)
  }

  /** Delete every target row whose key tuple appears in `victims` —
    * the RTBF counterpart of [[upsert]] (tombstone materialization for
    * the persisted indexes). Absent target is a no-op; a re-delivered
    * delete is a no-op by construction (anti-join of already-absent
    * keys). Same crash-safe tmp-write + rename swap as upsert.
    */
  def deleteKeys(
      spark: SparkSession, targetPath: String, victims: DataFrame,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "keys required")
    if (!recoverTarget(spark, targetPath)) return
    val target = spark.read.parquet(targetPath)
    val merged = target
      .join(victims.select(keys.map(col): _*).dropDuplicates(keys), keys, "left_anti")
      .select(target.columns.toSeq.map(col): _*)
    swapWrite(spark, targetPath, merged, targetExists = true)
  }

  /** Crash recovery: a previous run killed between the two swap
    * renames leaves the dataset ONLY at *_old — restore it before
    * reading, or a merge would silently rebuild the target from the
    * update batch alone (and then delete the sole copy). Returns
    * whether the target exists after recovery.
    */
  private def recoverTarget(spark: SparkSession, targetPath: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(targetPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val targetP = new org.apache.hadoop.fs.Path(targetPath)
    val oldP = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "_old")
    if (!fs.exists(targetP) && fs.exists(oldP) && !fs.rename(oldP, targetP))
      throw new java.io.IOException(
        s"upsert recovery failed: could not restore $oldP to $targetP")
    fs.exists(targetP)
  }

  private def swapWrite(
      spark: SparkSession, targetPath: String, merged: DataFrame,
      targetExists: Boolean): Unit = {
    val fs = new org.apache.hadoop.fs.Path(targetPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val targetP = new org.apache.hadoop.fs.Path(targetPath)
    val oldP = new org.apache.hadoop.fs.Path(targetPath.stripSuffix("/") + "_old")
    val tmp = targetPath.stripSuffix("/") + "_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    // Swap order matters: the old target moves ASIDE (not deleted)
    // before tmp renames in, and every rename's boolean result is
    // checked — a failed swap restores the old data instead of
    // silently losing the dataset (round-2 ADVICE). The _old copy is
    // also the crash-recovery source above.
    if (fs.exists(oldP)) fs.delete(oldP, true)
    if (targetExists && !fs.rename(targetP, oldP))
      throw new java.io.IOException(
        s"upsert swap failed: could not move $targetP aside to $oldP")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), targetP)) {
      val restored = targetExists && fs.rename(oldP, targetP)
      throw new java.io.IOException(
        s"upsert swap failed: could not rename $tmp to $targetP" +
          (if (restored) " (previous data restored)"
           else if (targetExists) s" (restore ALSO failed — data is at $oldP)"
           else ""))
    }
    if (targetExists) fs.delete(oldP, true)
    ()
  }
}
