package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index — the "index once, probe per batch"
  * shape a rolling training-data pipeline needs. [[MinHashLsh]]
  * answers "which pairs inside THIS corpus are near-dups"; this
  * operator answers the incremental question: "which docs of a NEW
  * batch near-duplicate an EXISTING corpus" without ever re-reading,
  * re-hashing, or re-shuffling the corpus text.
  *
  * Index layout (parquet datasets under `path`):
  *   - `sigs/`:    (doc_id, sig array<long>)        — one row per doc
  *   - `buckets/`: (band_idx, bucket, doc_id)       — `bands` rows per doc
  *   - `tombstones/`: (doc_id) — RTBF [[delete]] masks pending
  *     physical removal at the next [[compact]]
  *
  * Storing buckets separately from signatures keeps the per-doc
  * signature stored ONCE (not duplicated ×bands) and keeps the probe
  * join skinny: 16-byte bucket rows, ids only.
  *
  * Probe never shuffles the index: the (small, per-batch) probe side
  * is explicitly `broadcast()` into both joins — candidate generation
  * is a map-side hash join against the buckets SCAN, and signature
  * verification a map-side join against the sigs SCAN. The only
  * shuffle is the candidate-pair dedup, proportional to the number of
  * collisions, never to corpus size. At 100 TB the index is the big
  * thing; a probe that shuffles it per batch is the design error this
  * operator exists to avoid.
  *
  * [[append]] rides [[graft.sources.ParquetMerge.upsert]] keyed on
  * doc id, so re-delivered batches are exact no-ops (idempotent
  * loads, same contract as the reference's ON CONFLICT DO NOTHING —
  * `etl/cargar_postgres.py:135,248`). At 100 TB an append-only write
  * + [[graft.sources.Compactor]] pass replaces the rewrite that
  * upsert implies; the probe is layout-agnostic either way.
  */
object LshIndex {

  private def sigsPath(path: String) = s"${path.stripSuffix("/")}/sigs"
  private def bucketsPath(path: String) = s"${path.stripSuffix("/")}/buckets"
  private def metaPath(path: String) = s"${path.stripSuffix("/")}/meta"
  private def tombstonesPath(path: String) = s"${path.stripSuffix("/")}/tombstones"

  /** Hash parameters an index was built with. Persisted at build time
    * and read back by probe/append — signatures hashed under different
    * (shingleN, numHashes, bands, family) are silently incomparable,
    * so the parameters live IN the index, not in call sites.
    */
  final case class Params(
      shingleN: Int, numHashes: Int, bands: Int,
      family: MinHashLsh.Family = MinHashLsh.Family.XxChain)

  private def familyTag(f: MinHashLsh.Family): (String, Long) = f match {
    case MinHashLsh.Family.XxChain => ("xx", 0L)
    case MinHashLsh.Family.Md5Mod(seed) => ("md5", seed)
  }

  private def writeMeta(spark: SparkSession, path: String, p: Params): Unit = {
    import spark.implicits._
    val (fam, seed) = familyTag(p.family)
    Seq((p.shingleN, p.numHashes, p.bands, fam, seed))
      .toDF("shingle_n", "num_hashes", "bands", "family", "fam_seed")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(metaPath(path))
  }

  /** The parameters the index at `path` was built with. Reads the meta
    * schema tolerantly: an index persisted before the family columns
    * existed (3-column meta) defaults to XxChain — the only family that
    * code could have hashed with, so old indexes stay probe-able
    * across the deploy instead of throwing AnalysisException.
    */
  def params(spark: SparkSession, path: String): Params = {
    val meta = spark.read.parquet(metaPath(path))
    if (!meta.columns.contains("family")) {
      val r = meta.select("shingle_n", "num_hashes", "bands").head()
      return Params(r.getInt(0), r.getInt(1), r.getInt(2), MinHashLsh.Family.XxChain)
    }
    val r = meta
      .select("shingle_n", "num_hashes", "bands", "family", "fam_seed").head()
    val fam = r.getString(3) match {
      case "xx" => MinHashLsh.Family.XxChain
      case "md5" => MinHashLsh.Family.Md5Mod(r.getLong(4))
      case other => sys.error(s"unknown LSH index family: $other")
    }
    Params(r.getInt(0), r.getInt(1), r.getInt(2), fam)
  }

  /** Band the signatures under the family's bucket key — XxChain
    * compresses each slice to one 64-bit hash; Md5Mod keys on the
    * slice itself so the bucket join replays bit-exactly in the SQL
    * oracle (the [[MinHashLsh.nearDupPairs]] convention).
    */
  private def banded(
      sigs: DataFrame, numHashes: Int, bands: Int,
      family: MinHashLsh.Family): DataFrame = {
    val rows = numHashes / bands
    val bandKey: Int => org.apache.spark.sql.Column = family match {
      case MinHashLsh.Family.XxChain =>
        b => xxhash64(slice(col("sig"), b * rows + 1, rows), lit(b))
      case MinHashLsh.Family.Md5Mod(_) =>
        b => slice(col("sig"), b * rows + 1, rows)
    }
    sigs.select(
      col("doc_id"),
      posexplode(array((0 until bands).map(bandKey): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "bucket")
  }

  /** Build the index over `df` at `path` (overwrites). The hash
    * parameters are persisted with the index; probe/append read them
    * back instead of trusting call sites to repeat them.
    */
  def build(
      df: DataFrame, idCol: String, textCol: String, path: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      family: MinHashLsh.Family = MinHashLsh.Family.XxChain): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = MinHashLsh.signatures(df, idCol, textCol, shingleN, numHashes, family)
      .localCheckpoint() // one kernel pass feeds both datasets
    sigs.write.mode(SaveMode.Overwrite).parquet(sigsPath(path))
    banded(sigs, numHashes, bands, family)
      .write.mode(SaveMode.Overwrite).parquet(bucketsPath(path))
    writeMeta(df.sparkSession, path, Params(shingleN, numHashes, bands, family))
    // full-overwrite semantics: a rebuilt index carries no tombstones
    graft.sources.HPath.deleteIfExists(df.sparkSession, tombstonesPath(path))
  }

  /** RTBF tombstone delete: mask `victims` (a frame holding `idCol`)
    * from every future [[probe]] without rewriting the corpus-sized
    * sigs/buckets datasets — only the tombstone set is written
    * (idempotent key-upsert: a re-delivered purge request is an exact
    * no-op). [[compact]] materializes the purge; [[append]] of a
    * previously deleted doc re-ingests it (un-tombstones — a
    * post-purge write is a new record, not a resurrection).
    */
  def delete(
      spark: SparkSession, path: String, victims: DataFrame,
      idCol: String = "doc_id"): Unit =
    graft.sources.ParquetMerge.upsert(
      spark, tombstonesPath(path),
      victims.select(col(idCol).cast("long").as("doc_id")).distinct(),
      Seq("doc_id"))

  /** `df` minus tombstoned doc_ids. Tombstone sets are deletion
    * requests — O(purges), never corpus-sized — so the mask is a
    * broadcast anti-join and the index scans stay map-side (the probe
    * no-shuffle property survives deletes).
    */
  private def minusTombstones(
      spark: SparkSession, path: String, df: DataFrame): DataFrame = {
    val tp = tombstonesPath(path)
    if (!graft.sources.HPath.exists(spark, tp)) df
    else df.join(broadcast(spark.read.parquet(tp)), Seq("doc_id"), "left_anti")
  }

  /** Near-dup matches of `batch` against the index:
    * (batch_id, index_id, est_jaccard ≥ threshold). Index-side work is
    * two scans; no index shuffle (see object doc).
    */
  def probe(
      spark: SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7): DataFrame = {
    val Params(shingleN, numHashes, bands, family) = params(spark, path)
    val batchSigs = MinHashLsh.signatures(batch, idCol, textCol, shingleN, numHashes, family)
      .localCheckpoint() // feeds banding AND verification
    val probeB = banded(batchSigs, numHashes, bands, family)
      .select(col("band_idx"), col("bucket"), col("doc_id").as("batch_id"))

    val idxBuckets = minusTombstones(spark, path, spark.read.parquet(bucketsPath(path)))
    val candidates = idxBuckets
      .join(broadcast(probeB), Seq("band_idx", "bucket"))
      .filter(col("doc_id") =!= col("batch_id")) // self-match after append
      .select(col("batch_id"), col("doc_id").as("index_id"))
      .dropDuplicates("batch_id", "index_id")

    val idxSigs = minusTombstones(spark, path, spark.read.parquet(sigsPath(path)))
      .select(col("doc_id").as("index_id"), col("sig").as("sig_idx"))
    idxSigs
      .join(broadcast(candidates
        .join(batchSigs.select(col("doc_id").as("batch_id"), col("sig").as("sig_b")),
          "batch_id")), "index_id")
      .withColumn("est_jaccard",
        graft.functions.exprs.longArrayMatchCount(col("sig_idx"), col("sig_b"))
          .cast("double") / lit(numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select(col("batch_id"), col("index_id"), col("est_jaccard"))
  }

  /** Add `batch` to the index (idempotent on re-delivery), under the
    * index's own persisted hash parameters.
    */
  def append(
      spark: SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String): Unit = {
    val Params(shingleN, numHashes, bands, family) = params(spark, path)
    val sigs = MinHashLsh.signatures(batch, idCol, textCol, shingleN, numHashes, family)
      .localCheckpoint()
    graft.sources.ParquetMerge.upsert(
      spark, sigsPath(path), sigs, Seq("doc_id"))
    graft.sources.ParquetMerge.upsert(
      spark, bucketsPath(path), banded(sigs, numHashes, bands, family),
      Seq("doc_id", "band_idx"))
    // re-ingest after delete is a new record: un-tombstone the batch
    if (graft.sources.HPath.exists(spark, tombstonesPath(path)))
      graft.sources.ParquetMerge.deleteKeys(
        spark, tombstonesPath(path), sigs.select(col("doc_id")), Seq("doc_id"))
  }

  /** Compact the index at `path` into ONE artifact at `out`: K
    * appended deltas' worth of small files rewrite to ≈targetBytes
    * files per dataset ([[graft.sources.Compactor]]), the meta copies
    * verbatim — and because compaction only re-lays files (the LIVE
    * row set is untouched), probing the compacted index yields the
    * IDENTICAL candidate and match sets (`dedup_index_compact` oracles
    * it; LshIndexSpec asserts row-level equality). Tombstoned docs
    * drop for good and the compacted index carries no tombstones —
    * compaction is where a [[delete]] physically materializes
    * (`rtbf_lsh_purge` oracles post-compact probe ≡
    * rebuild-without-victims). This is the 100 TB housekeeping pass
    * that follows a week of streaming appends.
    */
  def compact(
      spark: SparkSession, path: String, out: String,
      targetBytes: Long = 128L << 20): Unit = {
    require(
      graft.sources.HPath.qualified(spark, out) !=
        graft.sources.HPath.qualified(spark, path),
      "compact to a fresh path, then swap")
    graft.sources.Compactor.compact(
      minusTombstones(spark, path, spark.read.parquet(sigsPath(path))),
      sigsPath(out), targetBytes)
    graft.sources.Compactor.compact(
      minusTombstones(spark, path, spark.read.parquet(bucketsPath(path))),
      bucketsPath(out), targetBytes)
    writeMeta(spark, out, params(spark, path))
    graft.sources.HPath.deleteIfExists(spark, tombstonesPath(out))
  }
}
