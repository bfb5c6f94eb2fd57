package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection (Broder 1997; the
  * banding scheme of Leskovec/Rajaraman/Ullman, "Mining of Massive
  * Datasets" ch. 3 — public literature).
  *
  * Pipeline (all shuffle-bounded, no O(N²) stage):
  *   1. shingle:   doc → distinct word n-grams
  *   2. signature: minhash_i = min over shingles of xxhash64(shingle, i)
  *                 — one hash family member per literal salt column, one
  *                 partial-aggregating groupBy(doc)
  *   3. band:      signature → `bands` buckets of `rowsPerBand` values,
  *                 bucket key = xxhash64(band values)
  *   4. candidates: docs sharing any (band_idx, bucket) — self-join on
  *                 the band key, distinct pairs
  *   5. verify:    estimated Jaccard = fraction of matching signature
  *                 positions ≥ threshold
  *
  * At 100 TB the only wide stages are the signature groupBy (keyed by
  * doc) and the band self-join (keyed by 64-bit bucket — uniformly
  * distributed, so no planned skew; pathological buckets are capped like
  * [[Dedup.ngramJaccardPairs]] hot shingles).
  */
object MinHashLsh {

  /** (doc_id, sig array<long>) — MinHash signatures.
    *
    * Each shingle string is hashed ONCE to a long; the hash family is
    * then xxhash64 over that fixed-width long + the family index —
    * 64× cheaper than re-hashing the string per family member.
    * numHashes defaults to 64: aggregate buffers wider than
    * `spark.sql.codegen.maxFields` (100) knock the whole aggregate out
    * of whole-stage codegen, a ~10× slowdown measured at sf0.1.
    */
  def signatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64): DataFrame = {
    val exploded = df
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.exprs.ngramHashes(col(textCol), shingleN)).as("sh64"))
    val minCols = (0 until numHashes).map(i => min(xxhash64(col("sh64"), lit(i))).as(s"h$i"))
    exploded
      .groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Candidate pairs from banded LSH + signature-estimated Jaccard.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, est ≥ threshold.
    */
  def nearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = signatures(df, idCol, textCol, shingleN, numHashes)

    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows), lit(b))): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "bucket")

    // cap pathological buckets (all-identical boilerplate docs)
    val capped = banded
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band_idx"), col("bucket"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")

    val a = capped.select(
      col("band_idx"), col("bucket"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(
      col("band_idx"), col("bucket"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val candidates = a.join(b, Seq("band_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          .cast("double") / lit(numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }
}
