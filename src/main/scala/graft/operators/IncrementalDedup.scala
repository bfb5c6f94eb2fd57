package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Cross-corpus incremental dedup: filter a NEW batch against an
  * EXISTING corpus without joining the corpus — the shape a rolling
  * training-data pipeline needs (yesterday's 100 TB never re-shuffles).
  *
  *   1. Build a Bloom filter over the existing corpus's content hashes
  *      (one scan, mergeable sketch — Spark's built-in
  *      `DataFrame.stat.bloomFilter`).
  *   2. Broadcast it; probable-duplicate rows in the new batch are
  *      split out map-side (zero shuffle for the definite-new rows).
  *   3. Bloom false positives (rate `fpp`) are exactly verified with a
  *      join against ONLY the candidate hashes — a join whose left side
  *      is |new| × fpp, not |corpus|.
  */
object IncrementalDedup {

  private def contentHash(textCol: String) =
    xxhash64(lower(regexp_replace(coalesce(col(textCol), lit("")), "\\s+", " ")))

  /** Rows of `fresh` whose (normalized) text does not appear in
    * `existing`. Exact — bloom false positives are re-checked.
    */
  def newDocuments(
      existing: DataFrame, fresh: DataFrame, textCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val hashed = existing.select(contentHash(textCol).as("h"))
    val bloom: BloomFilter = hashed.stat.bloomFilter("h", expectedItems, fpp)
    val bytes = locally {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }

    // Hash + probe ONCE (localCheckpoint), then split by the probe bit:
    // the earlier typed `filter { r: Row => bloom... }` pair scanned
    // fresh twice, re-ran the normalizing hash both times, and pulled
    // every column through the Row deserializer — the native
    // [[graft.functions.BloomMightContainLong]] probe is a map-side
    // boolean inside the projection.
    val freshHashed = fresh
      .withColumn("_h", contentHash(textCol))
      .withColumn("_might",
        graft.functions.exprs.bloomMightContainLong(col("_h"), bytes))
      .localCheckpoint()
    val definitelyNew = freshHashed.filter(!col("_might"))
    // exact verify of the (small) candidate set only
    val truePositives = freshHashed.filter(col("_might")).join(
      hashed.select(col("h").as("_h")).distinct(), Seq("_h"), "left_anti")
    definitelyNew.unionByName(truePositives).drop("_h", "_might")
  }
}
