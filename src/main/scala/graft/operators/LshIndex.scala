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
  * Index layout (two parquet datasets under `path`):
  *   - `sigs/`:    (doc_id, sig array<long>)        — one row per doc
  *   - `buckets/`: (band_idx, bucket, doc_id)       — `bands` rows per doc
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

  /** Hash parameters an index was built with. Persisted at build time
    * and read back by probe/append — signatures hashed under different
    * (shingleN, numHashes, bands) are silently incomparable, so the
    * parameters live IN the index, not in call sites.
    */
  final case class Params(shingleN: Int, numHashes: Int, bands: Int)

  private def writeMeta(spark: SparkSession, path: String, p: Params): Unit = {
    import spark.implicits._
    Seq((p.shingleN, p.numHashes, p.bands))
      .toDF("shingle_n", "num_hashes", "bands")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(metaPath(path))
  }

  /** The parameters the index at `path` was built with. */
  def params(spark: SparkSession, path: String): Params = {
    val r = spark.read.parquet(metaPath(path))
      .select("shingle_n", "num_hashes", "bands").head()
    Params(r.getInt(0), r.getInt(1), r.getInt(2))
  }

  private def banded(
      sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    sigs.select(
      col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows), lit(b))): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "bucket")
  }

  /** Build the index over `df` at `path` (overwrites). The hash
    * parameters are persisted with the index; probe/append read them
    * back instead of trusting call sites to repeat them.
    */
  def build(
      df: DataFrame, idCol: String, textCol: String, path: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = MinHashLsh.signatures(df, idCol, textCol, shingleN, numHashes)
      .localCheckpoint() // one kernel pass feeds both datasets
    sigs.write.mode(SaveMode.Overwrite).parquet(sigsPath(path))
    banded(sigs, numHashes, bands)
      .write.mode(SaveMode.Overwrite).parquet(bucketsPath(path))
    writeMeta(df.sparkSession, path, Params(shingleN, numHashes, bands))
  }

  /** Near-dup matches of `batch` against the index:
    * (batch_id, index_id, est_jaccard ≥ threshold). Index-side work is
    * two scans; no index shuffle (see object doc).
    */
  def probe(
      spark: SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7): DataFrame = {
    val Params(shingleN, numHashes, bands) = params(spark, path)
    val batchSigs = MinHashLsh.signatures(batch, idCol, textCol, shingleN, numHashes)
      .localCheckpoint() // feeds banding AND verification
    val probeB = banded(batchSigs, numHashes, bands)
      .select(col("band_idx"), col("bucket"), col("doc_id").as("batch_id"))

    val idxBuckets = spark.read.parquet(bucketsPath(path))
    val candidates = idxBuckets
      .join(broadcast(probeB), Seq("band_idx", "bucket"))
      .filter(col("doc_id") =!= col("batch_id")) // self-match after append
      .select(col("batch_id"), col("doc_id").as("index_id"))
      .dropDuplicates("batch_id", "index_id")

    val idxSigs = spark.read.parquet(sigsPath(path))
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
    val Params(shingleN, numHashes, bands) = params(spark, path)
    val sigs = MinHashLsh.signatures(batch, idCol, textCol, shingleN, numHashes)
      .localCheckpoint()
    graft.sources.ParquetMerge.upsert(
      spark, sigsPath(path), sigs, Seq("doc_id"))
    graft.sources.ParquetMerge.upsert(
      spark, bucketsPath(path), banded(sigs, numHashes, bands),
      Seq("doc_id", "band_idx"))
  }
}
