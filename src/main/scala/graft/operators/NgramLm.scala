package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram LM quality filter (the CCNet shape — Wenzek et al., LREC
  * 2020: score web documents with a language model trained on a clean
  * reference corpus, keep the low-perplexity head). A bigram model
  * trains on the reference slice; held-out documents score by how
  * cheaply the reference model encodes them.
  *
  * Deterministic integer-grid formulation: real perplexity sums
  * log-probabilities — doubles whose addition order is engine-dependent
  * and whose `ln` is not correctly rounded, both banned under the
  * bit-exact oracle contract. Instead each bigram's cost is measured in
  * whole BITS via bit-length (bitlen(x) = ⌊log2 x⌋ + 1, exact integer
  * arithmetic in any engine):
  *
  *   seen bigram:   cost = bitlen(c1) − bitlen(cost12)   ≈ log2(c1/c12)
  *   unseen bigram: cost = bitlen(N)                      ≈ log2(N/1)
  *
  * where c12 = reference count of (w1,w2), c1 = Σ_w2 c12 (the prefix
  * mass), N = total reference bigrams — i.e. an unseen transition costs
  * what a count-1 event under the full mass would. Σ cost is an exact
  * BIGINT; the per-doc mean (bits/transition, the log2-perplexity
  * analog) is the single fixed-order division total/n. CCNet buckets
  * docs by perplexity terciles — a whole-bit grid is well inside that
  * use's resolution.
  *
  * 100 TB shape: the model tables (c12, c1) are vocabulary-bounded
  * artifacts built from the reference slice with two keyed
  * aggregations; scoring is ONE pass over the held-out token stream —
  * a bigram-keyed equi-join (broadcast them instead when the reference
  * model fits, the LineDedup blacklist pattern) + one doc-grain
  * aggregation. N rides a broadcast 1-row relation (J9 shape). Nothing
  * driver-side; thresholds are configured constants, as in production
  * CCNet where the cutoffs are fit once on a sample and applied
  * map-only.
  */
object NgramLm {

  /** Score every document NOT in the training slice. Returns
    * (idCol, n_bigrams, n_unseen, total_bits, mean_bits) — documents
    * with fewer than two tokens score (0, 0, 0, 0.0).
    */
  def bigramBits(
      docs: DataFrame, idCol: String, textCol: String,
      isTrain: Column): DataFrame = {
    val big = docs
      .select(col(idCol), isTrain.as("is_train"), TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(
        col(idCol), col("is_train"),
        explode(expr(
          "transform(sequence(1, size(toks) - 1), j -> " +
            "named_struct('w1', toks[j-1], 'w2', toks[j]))")).as("b"))
      .select(col(idCol), col("is_train"), col("b.w1").as("w1"), col("b.w2").as("w2"))

    val train = big.filter(col("is_train"))
    val c12 = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val n = train.agg(count(lit(1)).as("nn"))

    val scored = big.filter(!col("is_train"))
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(n))
      .select(
        col(idCol),
        when(col("c12").isNull, length(bin(col("nn"))))
          .otherwise(length(bin(col("c1"))) - length(bin(col("c12")))).as("bits"),
        when(col("c12").isNull, 1).otherwise(0).as("unseen"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("unseen")).as("n_unseen"),
        sum(col("bits")).as("total_bits"))

    // short documents (no bigrams) still appear, with zero cost
    docs.filter(!isTrain)
      .select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        coalesce(col("total_bits"), lit(0L)).as("total_bits"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("total_bits").cast("double") / col("n_bigrams").cast("double"))
          .as("mean_bits"))
  }
}
