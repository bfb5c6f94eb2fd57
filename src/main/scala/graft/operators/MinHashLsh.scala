package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection (Broder 1997; the
  * banding scheme of Leskovec/Rajaraman/Ullman, "Mining of Massive
  * Datasets" ch. 3 — public literature).
  *
  * Pipeline (all shuffle-bounded, no O(N²) stage):
  *   1. shingle:   doc → distinct word n-grams
  *   2. signature: minhash_i = min over shingles of xxhash64(shingle, i)
  *                 — the full signature per document in one map-only
  *                 kernel pass ([[graft.functions.MinHashSig]])
  *   3. band:      signature → `bands` buckets of `rowsPerBand` values,
  *                 bucket key = xxhash64(band values)
  *   4. candidates: docs sharing any (band_idx, bucket) — self-join on
  *                 the band key, distinct pairs
  *   5. verify:    estimated Jaccard = fraction of matching signature
  *                 positions ≥ threshold
  *
  * At 100 TB the only wide stage is the band self-join (keyed by
  * 64-bit bucket — uniformly distributed, so no planned skew;
  * pathological buckets are capped like [[Dedup.ngramJaccardPairs]]
  * hot shingles); shingling and signatures are map-only.
  */
object MinHashLsh {

  /** Hash-family choice for shingling + the MinHash permutations. */
  sealed trait Family
  object Family {
    /** xxhash64 seed-chained token/shingle hashes — the fast default
      * at scale (JVM-only; verified by recall/precision specs).
      */
    case object XxChain extends Family

    /** md5-lower63 shingle hashes + (a·h+b) mod 2⁶¹−1 permutations —
      * ~5× more hash cost but every stage has a bit-exact DuckDB twin
      * ([[graft.functions.Md5NgramHashes]]/[[graft.functions.MinHashSigMod]]),
      * so the whole near-dup query is oracle-checkable.
      */
    final case class Md5Mod(seed: Long = 7L) extends Family
  }

  /** (doc_id, sig array<long>) — MinHash signatures.
    *
    * Each shingle string is hashed ONCE to a long; the family then
    * derives all `numHashes` members from that fixed-width value. The
    * whole signature is computed per row by a one-pass kernel — a
    * map-only stage with NO shuffle (the earlier explode →
    * groupBy(doc) formulation re-keyed every shingle of the corpus;
    * at 100 TB that shuffle IS the job). Docs too short to shingle
    * yield no signature, matching the explode-based behavior.
    */
  def signatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64,
      family: Family = Family.XxChain): DataFrame = {
    val sig = family match {
      case Family.XxChain =>
        graft.functions.exprs.minhashSig(
          graft.functions.exprs.ngramHashes(col(textCol), shingleN), numHashes)
      case Family.Md5Mod(seed) =>
        graft.functions.md5exprs.minhashSigMod(
          graft.functions.md5exprs.md5NgramHashes(col(textCol), shingleN), numHashes, seed)
    }
    df.select(col(idCol).as("doc_id"), sig.as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** Candidate pairs from banded LSH + signature-estimated Jaccard.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, est ≥ threshold.
    */
  def nearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 1000,
      family: Family = Family.XxChain): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // Signatures feed three consumers (banding + both verify sides);
    // localCheckpoint so the map-only kernel runs once. This is the
    // natural materialization point at scale too (the LSH index
    // build). Checkpoint, not persist: checkpoint blocks are released
    // by the ContextCleaner when the frame becomes unreachable,
    // whereas persist() pins an entry in the CacheManager until an
    // explicit unpersist — which a lazily-returned result can never
    // safely issue (round-2 ADVICE leak).
    val sigs = signatures(df, idCol, textCol, shingleN, numHashes, family)
      .localCheckpoint()

    // Band on ids ONLY: the bucket shuffle and pair-dedup move
    // 16-byte (band, bucket, id) rows, not 0.5 KB signature payloads —
    // a 30× shuffle-volume cut that grows with numHashes. XxChain
    // compresses each band slice to one 64-bit bucket hash; Md5Mod
    // keys on the slice itself (`rows` longs — still skinny) so the
    // bucket join stays reproducible in the SQL oracle.
    val bandKey: Int => Column = family match {
      case Family.XxChain => b => xxhash64(slice(col("sig"), b * rows + 1, rows), lit(b))
      case Family.Md5Mod(_) => b => slice(col("sig"), b * rows + 1, rows)
    }
    val banded = sigs.select(
      col("doc_id"),
      posexplode(array((0 until bands).map(bandKey): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "bucket")

    // Cap pathological buckets (all-identical boilerplate docs) via a
    // broadcast hot-bucket blacklist: groupBy with map-side combine
    // shrinks to one row per bucket BEFORE the exchange, the HAVING
    // filter leaves only the handful of over-cap buckets, and the
    // anti-join is map-only. The count-over-window formulation this
    // replaces sorted every (band, bucket, id) row inside the widest
    // stage of the pipeline — at 100 TB that per-partition sort is
    // pure overhead for what is semantically a blacklist lookup.
    val hotBuckets = broadcast(
      banded.groupBy(col("band_idx"), col("bucket"))
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > maxBucket)
        .select(col("band_idx"), col("bucket")))
    val capped = banded.join(hotBuckets, Seq("band_idx", "bucket"), "left_anti")

    val a = capped.select(col("band_idx"), col("bucket"), col("doc_id").as("id_a"))
    val b = capped.select(col("band_idx"), col("bucket"), col("doc_id").as("id_b"))
    val candidates = a.join(b, Seq("band_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // verify: re-attach signatures, estimate Jaccard with the one-pass
    // match-count kernel (zip_with/filter/size ran 3 interpreted
    // lambdas per element).
    candidates
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        graft.functions.exprs.longArrayMatchCount(col("sig_a"), col("sig_b"))
          .cast("double") / lit(numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }
}
