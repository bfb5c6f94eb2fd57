package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.exprs

/** Johnson–Lindenstrauss dimensionality reduction with a Rademacher
  * (±1) projection matrix (Achlioptas 2003, "Database-friendly random
  * projections" — public literature): distances are preserved within
  * 1±ε with k = O(log n / ε²) output dims, and the ±1 matrix needs no
  * floats at all.
  *
  * The engine twist that makes it ORACLE-exact: vectors quantize to an
  * integer grid first ([[graft.functions.QuantizeVec]], the IvfIndex
  * floor-grid trick), so the projection ([[graft.functions.SignedProject]])
  * and both squared distances ([[graft.functions.LongVecDistSq]]) are
  * pure BIGINT arithmetic — no summation-order sensitivity anywhere.
  *
  * Scale shape: projection is map-only (k·dim adds per row, no
  * shuffle); the projected corpus is k/dim the size of the original —
  * the cheap first stage of any 100 TB embedding pipeline where the
  * 64→16 reduction cuts every downstream shuffle and scan 4×.
  */
object JlProject {

  /** Deterministic ±1 matrix (k rows × dim cols) from a seeded PRNG —
    * generated once driver-side and embedded as literals in BOTH the
    * Spark expression and the oracle SQL, the seededCentroids pattern.
    */
  def signMatrix(k: Int, dim: Int, seed: Long): IndexedSeq[IndexedSeq[Int]] = {
    val rng = new scala.util.Random(seed)
    IndexedSeq.fill(k)(IndexedSeq.fill(dim)(rng.nextInt(2) * 2 - 1))
  }

  /** Per-pair distortion of the projection: probes × corpus with
    * original (quantized) and projected squared L2 distances plus the
    * scaled ratio `ppm = proj_d2·1e6 div (k·orig_d2)` (≈1e6 when the
    * projection preserves the distance; exact integer division).
    */
  def distortionPairs(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      signs: Seq[Seq[Int]], quantScale: Int = 1024): DataFrame = {
    val k = signs.size
    def prep(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id),
        exprs.quantizeVec(col(vecCol), quantScale).as(s"q_$id"))
        .withColumn(s"p_$id", exprs.signedProject(col(s"q_$id"), signs))
    val c = prep(corpus, "neighbor_id")
    val p = prep(probes, "query_id")
    c.crossJoin(broadcast(p))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        exprs.longVecDistSq(col("q_query_id"), col("q_neighbor_id")).as("orig_d2"),
        exprs.longVecDistSq(col("p_query_id"), col("p_neighbor_id")).as("proj_d2"))
      .filter(col("orig_d2") > 0)
      .withColumn("ppm", expr(s"(proj_d2 * 1000000) div ($k * orig_d2)"))
  }
}
