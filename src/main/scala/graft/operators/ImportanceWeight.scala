package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-shaped importance-weighted data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every candidate document by how target-like its unigram
  * distribution is, then keep the top-k. DSIR proper uses a
  * log-likelihood ratio under hashed n-gram models; logs are
  * library-dependent and can never be bit-reproduced across engines
  * (CLAUDE.md), so the score here is the integer-scaled linear ratio
  * proxy: per token occurrence, `((tc+1) * 1_000_000) div (bc+1)`
  * (add-one smoothed target count over background count, micro-scaled
  * integer division), summed per document — an exact-integer,
  * order-independent sum that ranks the same direction as the
  * likelihood ratio for the dominant terms. Tokens ABSENT from the
  * target contribute zero: under a linear (un-logged) ratio, add-one
  * smoothing would otherwise hand background-only rarities a larger
  * ratio than genuinely target-heavy common tokens ((0+1)·10⁶/(1+1)
  * = 500 000 for a background hapax), letting gibberish outrank
  * target-like text — the rare-feature pathology DSIR's hashed
  * buckets exist to suppress, handled here by target-anchoring.
  *
  * 100 TB shape: both unigram tables come out of ONE pass over the
  * exploded token stream (conditional sums per token); the stream is
  * localCheckpoint'ed because it feeds that aggregate AND the probe
  * side with no exchange between them (the broadcast-blacklist rule,
  * CLAUDE.md). The vocab joins back by token equi-join — broadcast
  * when the vocabulary fits, shuffle otherwise — and the per-doc
  * score is one map-side-combining aggregation. No floats anywhere.
  *
  * Overflow headroom: ratio ≤ (tc+1)·10⁶ and a doc contributes
  * n_tokens terms, so scores stay far below 2⁶³ for any corpus whose
  * target slice is ≤ ~10⁹ tokens; a 100 TB deployment would drop the
  * 10⁶ scale or bucket the vocabulary (disclosed, not silent).
  */
object ImportanceWeight {

  /** Rank non-target docs by target-likeness of their tokens.
    * `isTarget` marks the target-domain slice (e.g. a benchmark or a
    * curated seed corpus). Returns (idCol, importance, n_tokens) for
    * the top `k` docs by (importance DESC, id ASC).
    */
  def selectTopK(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val tk = docs
      .select(
        col(idCol),
        isTarget.as("is_target"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .localCheckpoint()
    val vocab = tk
      .groupBy(col("tok"))
      .agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tc"),
        sum(when(col("is_target"), 0L).otherwise(1L)).as("bc"))
      .withColumn(
        "ratio",
        expr("CASE WHEN tc > 0 THEN ((tc + 1) * 1000000) div (bc + 1) ELSE 0 END"))
    tk.filter(!col("is_target"))
      .join(broadcast(vocab.select(col("tok"), col("ratio"))), Seq("tok"))
      .groupBy(col(idCol))
      .agg(
        sum(col("ratio")).as("importance"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("importance").desc, col(idCol).asc)
      .limit(k)
  }
}
