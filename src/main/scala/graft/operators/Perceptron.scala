package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed batch perceptron (Rosenblatt 1958; the batch variant is
  * the standard data-parallel form — public literature) over
  * integer-quantized features, fully deterministic:
  *
  *   margin(i) = Σ_d w[d]·x(i,d)        (exact integer)
  *   mis       = { i : y(i)·margin(i) ≤ 0 }
  *   w[d]     += Σ_{i ∈ mis} y(i)·x(i,d)
  *
  * The model is TINY (dims longs) and the data is huge — so each round
  * is two scans of the feature frame (one margin aggregation, one
  * update aggregation keyed by the misclassified ids) and the weight
  * vector rides the PLAN as a broadcast literal (`element_at(lit(w))`),
  * exactly the PqCodes-codebook pattern. Driver participation per
  * round is `dims` update rows plus a 2-row error count — bounded,
  * like the BPE argmax. Everything is Long arithmetic (features come
  * from [[graft.functions.QuantizeVec]]'s integer grid), so sums are
  * order-independent and every round replays bit-exactly in SQL.
  *
  * `features`: one row per (id, dim, x) with the label `y` ∈ {+1,−1}
  * attached — callers localCheckpoint it, every round scans it twice.
  */
object Perceptron {

  final case class RoundStat(round: Int, nMisPos: Long, nMisNeg: Long)

  /** Runs `rounds` batch updates; returns the weight vector AFTER each
    * round plus the per-round misclassification counts (errors of the
    * entering weights, i.e. round 1 counts errors of the zero model).
    */
  def train(features: DataFrame, dims: Int, rounds: Int)
      : (Seq[Array[Long]], Seq[RoundStat]) = {
    require(dims >= 1 && rounds >= 1, "dims and rounds must be positive")
    // The per-round collects below are driver-bounded by construction:
    // misCounts is O(#labels) = 2 rows and upd is O(dims) rows — the
    // weight vector itself lives on the driver, so dims IS the model
    // size. Cap it so an unbounded feature key fails loudly.
    require(dims <= (1 << 20),
      s"perceptron dims=$dims exceeds 2^20 — the weight vector and the per-round " +
        "gradient collect are driver-side O(dims); hash features into a bounded space")
    var w = Array.fill(dims)(0L)
    val history = Seq.newBuilder[Array[Long]]
    val stats = Seq.newBuilder[RoundStat]
    var r = 1
    while (r <= rounds) {
      val margins = features
        .groupBy(col("id"), col("y"))
        .agg(sum(element_at(lit(w), col("dim").cast("int") + 1) * col("x"))
          .as("margin"))
      val mis = margins.filter(col("y") * col("margin") <= 0)
        .select(col("id"), col("y"))
      val misCounts = mis.groupBy(col("y")).agg(count(lit(1)).as("n"))
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      stats += RoundStat(r,
        misCounts.getOrElse(1L, 0L), misCounts.getOrElse(-1L, 0L))
      val upd = features
        .join(mis.select(col("id").as("mid")), col("id") === col("mid"))
        .groupBy(col("dim"))
        .agg(sum(col("y") * col("x")).as("du"))
        .collect()
      val next = w.clone()
      upd.foreach { row =>
        next(row.getInt(0)) += row.getLong(1)
      }
      w = next
      history += w
      r += 1
    }
    (history.result(), stats.result())
  }
}
