package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Hash

/** Deterministic negative sampling — contrastive-pair construction for
  * embedding/retrieval training: for every row, `k` pseudo-random
  * "negative" partner rows, reproducible across runs, engines, and
  * partition layouts (no RNG state; the draw is a pure hash of
  * (id, draw index)).
  *
  * Shape: ids get a dense rank 1..N ([[DenseId]] — range-partition +
  * zipWithIndex, no global window); each (id, i<k) draw hashes to a
  * rank via md5-lower63 mod N; a join on the drawn rank resolves the
  * negative's id. Uniform hash → uniform rank, so the rank join is
  * skew-free by construction; the k× row blowup is the output size,
  * not an intermediate. Self-draws (a row drawing itself) are dropped,
  * so a row may carry k−1 negatives occasionally — deterministically.
  *
  * Corpus size N rides a broadcast 1-row aggregate (the reference's
  * J9 cross-join-params shape) — nothing collects to the driver.
  */
object NegativeSampling {

  /** (idCol, draw_idx, neg_id): `k` hash-drawn negatives per row.
    * `idCol` must be unique and non-null.
    */
  def draw(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0)
    val ids = df.select(col(idCol))
    val ranked = DenseId.withDenseId(ids, Seq(col(idCol)), "_rk")
      .localCheckpoint() // feeds the count AND the rank-resolve join
    val nRows = ranked.agg(max(col("_rk")).as("_n"))
    val draws = ids
      .crossJoin(broadcast(nRows))
      .select(
        col(idCol),
        explode(sequence(lit(0L), lit(k - 1L))).as("draw_idx"),
        col("_n"))
      .withColumn("_rk",
        Md5Hash.lower63Col(
          concat(col(idCol).cast("string"), lit(":"), col("draw_idx").cast("string")))
          % col("_n") + 1)
    draws
      .join(ranked.select(col("_rk"), col(idCol).as("neg_id")), "_rk")
      .filter(col("neg_id") =!= col(idCol))
      .select(col(idCol), col("draw_idx"), col("neg_id"))
  }

  /** Hard-negative mining (the contrastive-training refinement of
    * [[draw]]): instead of uniform negatives, sample from the band of
    * NEAR-BUT-NOT-NEAREST neighbors — ranks (skipTop, kScan] of an
    * exact top-kScan scan — which are the negatives that actually
    * move a retrieval model. The per-query sample of `perQuery` is
    * the md5-lowest band members (the MixtureSample convention):
    * deterministic, engine-portable, append-stable within a fixed
    * band.
    *
    * 100 TB shape: inherits [[Similarity.bruteForceTopK]]'s broadcast
    * probe set + bounded-heap TopKPerGroup for the scan (swap in the
    * IVF/PQ searcher for a billion-vector corpus — the band+sample
    * stages are searcher-agnostic); the md5 sample is one partitioned
    * window over ≤ probes×(kScan−skipTop) rows.
    */
  def hardNegatives(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      kScan: Int, skipTop: Int, perQuery: Int): DataFrame = {
    require(0 < skipTop && skipTop < kScan && perQuery > 0)
    import org.apache.spark.sql.expressions.Window
    Similarity.bruteForceTopK(corpus, probes, idCol, vecCol, kScan)
      .filter(col("rank") > skipTop)
      .withColumn(
        "_draw",
        md5(concat(col("query_id").cast("string"), lit(":"), col("neighbor_id").cast("string"))))
      .withColumn(
        "pick",
        row_number().over(Window.partitionBy(col("query_id")).orderBy(col("_draw"))))
      .filter(col("pick") <= perQuery)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("pick"))
  }
}
