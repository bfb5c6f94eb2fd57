package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.exprs.{adcDistance, pqAdcTable, pqCodes}

/** Persisted PQ index — the [[LshIndex]] contract for the vector
  * tier: encode the corpus ONCE, then serve any number of probe
  * batches from stored M-byte codes without ever re-reading or
  * re-encoding corpus vectors. This is the artifact boundary a
  * production ANN stack ships across jobs: train/encode offline,
  * probe online.
  *
  * Index layout (parquet datasets under `path`):
  *   - `codes/`:     (vec_id, codes array<int>)   — one row per vector
  *   - `codebooks/`: (m, j, cw array<long>)       — M×ksub centroids
  *
  * The codebooks ARE the metadata: encode parameters (dim, M, ksub)
  * are implied by their shape, and [[append]] always encodes with the
  * STORED codebooks — a batch encoded under different codebooks is
  * silently incomparable, so the parameters live in the index, not at
  * call sites (the LshIndex.Params rule).
  *
  * Probe never shuffles the index: probes build their ADC lookup
  * tables map-side and broadcast into the codes SCAN; per-pair cost
  * is M integer lookups; bounded-heap TopKPerGroup keeps top-k. The
  * only exchange carries (query_id, neighbor_id, dist) heap rows.
  * [[append]] rides [[graft.sources.ParquetMerge.upsert]] keyed on
  * vec_id, so re-delivered batches are exact no-ops; at 100 TB an
  * append-only write + Compactor pass replaces the rewrite.
  */
object PqStore {

  private def codesPath(path: String) = s"${path.stripSuffix("/")}/codes"
  private def codebooksPath(path: String) = s"${path.stripSuffix("/")}/codebooks"

  /** Encode `corpus` under `codebooks` and persist the index. */
  def build(
      corpus: DataFrame, idCol: String, vecCol: String, path: String,
      codebooks: Seq[Seq[Seq[Long]]]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, m) =>
      cb.zipWithIndex.map { case (cw, j) => (m, j, cw) }
    }.toDF("m", "j", "cw")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(codebooksPath(path))
    corpus.select(
      col(idCol).cast("long").as("vec_id"),
      pqCodes(col(vecCol), codebooks).as("codes"))
      .write.mode(SaveMode.Overwrite).parquet(codesPath(path))
  }

  /** The codebooks the index at `path` was encoded with. */
  def codebooks(spark: SparkSession, path: String): Seq[Seq[Seq[Long]]] = {
    import spark.implicits._
    spark.read.parquet(codebooksPath(path))
      .select(col("m"), col("j"), col("cw"))
      .as[(Int, Int, Seq[Long])].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toIndexedSeq }
  }

  /** ADC top-k of `probes` against the stored codes — corpus vectors
    * are never touched. Output: (query_id, neighbor_id, rank,
    * adc_dist), the [[PqIndex.topK]] contract.
    */
  def probe(
      spark: SparkSession, path: String, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val cbs = codebooks(spark, path)
    val ksub = cbs.head.length
    val tabled = probes.select(
      col(idCol).cast("long").as("query_id"),
      pqAdcTable(col(vecCol), cbs).as("tbl"))
    val pairs = spark.read.parquet(codesPath(path))
      .withColumnRenamed("vec_id", "neighbor_id")
      .crossJoin(broadcast(tabled))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dist", adcDistance(col("codes"), col("tbl"), ksub))
    graft.plans.TopKPerGroup(
      pairs, Seq("query_id"), Seq(("adc_dist", false), ("neighbor_id", false)), k)
      .withColumnRenamed("topk_rank", "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adc_dist"))
  }

  /** Encode a new batch with the STORED codebooks and upsert by
    * vec_id — re-delivery is an exact no-op.
    */
  def append(
      spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val cbs = codebooks(spark, path)
    val coded = batch.select(
      col(idCol).cast("long").as("vec_id"),
      pqCodes(col(vecCol), cbs).as("codes"))
    graft.sources.ParquetMerge.upsert(spark, codesPath(path), coded, Seq("vec_id"))
  }
}
