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
}
