package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.exprs.simhashText

/** SimHash near-duplicate detection (Charikar 2002; Manku/Jain/Sarma
  * WWW'07 used the same chunk-index trick at web scale — public
  * literature).
  *
  * Each doc gets a 64-bit fingerprint ([[graft.functions.SimHash64]]);
  * near-dups are pairs within `maxHamming` bits. Candidate generation
  * uses the pigeonhole principle: split the 64 bits into
  * `maxHamming + 1` chunks — any pair within `maxHamming` bits agrees
  * exactly on at least one chunk — then self-join per (chunk_idx,
  * chunk_value) and verify with `bit_count(a XOR b)`.
  */
object SimHashDedup {

  /** (doc_id, simhash) fingerprints — single-pass tokenize+vote.
    * `md5Based` switches the token hash from xxhash64 (fast, JVM-only)
    * to md5-lower63 ([[graft.functions.SimHashTextMd5]], 63-bit
    * fingerprint) whose votes a DuckDB oracle reproduces bit-exactly.
    */
  def fingerprints(
      df: DataFrame, idCol: String, textCol: String,
      md5Based: Boolean = false): DataFrame = {
    val fp =
      if (md5Based) graft.functions.md5exprs.simhashTextMd5(col(textCol))
      else simhashText(col(textCol))
    df.select(col(idCol).as("doc_id"), fp.as("simhash"))
  }

  /** Pairs (id_a < id_b) with hamming(simhash_a, simhash_b) ≤ maxHamming. */
  def nearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000,
      md5Based: Boolean = false): DataFrame =
    pairsFromFingerprints(
      fingerprints(df, idCol, textCol, md5Based), maxHamming, maxBucket)

  /** Pigeonhole blocking + hamming verify over ANY 64-bit-fingerprint
    * frame `(doc_id, simhash)` — shared by text SimHash and the image
    * dHash path ([[Multimodal.dHash]]): hamming ≤ k guarantees at
    * least one of k+1 bit-chunks matches exactly, so candidates come
    * from an equi-join on (chunk_idx, chunk_val), never an all-pairs
    * product.
    */
  def pairsFromFingerprints(
      fps: DataFrame, maxHamming: Int, maxBucket: Int): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val chunked = fps.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until chunks).map(i =>
        shiftright(col("simhash"), i * bitsPer)
          .bitwiseAND(lit((1L << bitsPer) - 1))): _*)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_val")
      // localCheckpoint: the simhash kernel feeds the blacklist agg and
      // both self-join sides; the broadcast probe has no exchange to
      // reuse (same lesson as Dedup.winnowPairs / MinHashLsh).
      .localCheckpoint()
    // Hot-chunk blacklist (groupBy + broadcast anti-join) instead of
    // count-over-window — the candidate stage stays sort-free.
    val hotChunks = broadcast(
      chunked.groupBy(col("chunk_idx"), col("chunk_val"))
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > maxBucket)
        .select(col("chunk_idx"), col("chunk_val")))
    val capped = chunked.join(hotChunks, Seq("chunk_idx", "chunk_val"), "left_anti")
    val a = capped.select(col("chunk_idx"), col("chunk_val"),
      col("doc_id").as("id_a"), col("simhash").as("fp_a"))
    val b = capped.select(col("chunk_idx"), col("chunk_val"),
      col("doc_id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
