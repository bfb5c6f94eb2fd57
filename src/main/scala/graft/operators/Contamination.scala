package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora: per-document
  * overlap of distinct word n-grams against a benchmark/eval gram set
  * (the decontamination step every large-scale pretraining pipeline
  * runs — e.g. GPT-3 appendix C / PaLM-style 8–13-gram overlap checks,
  * public literature).
  *
  * Scale shape: the benchmark side (eval suites) is tiny relative to a
  * 100 TB corpus, so its distinct gram set is BROADCAST — the corpus
  * side stays map-local (tokenize → shingle → explode → broadcast hash
  * join → partial agg on doc id), one shuffle for the per-doc final
  * aggregate keyed by doc id. Never a shuffle keyed by gram, which
  * would move the full corpus gram stream.
  */
object Contamination {

  /** Per-doc gram overlap of `docs` against `benchmark`.
    *
    * Returns one row per `docs` row: id, `n_grams` (distinct word
    * n-grams), `n_overlap` (of those, how many occur anywhere in the
    * benchmark), `contaminated` (1 if any overlap). Docs with fewer
    * than `n` tokens carry zero grams and survive with
    * n_grams = n_overlap = 0.
    */
  def overlap(
      docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
      .withColumn("bench_hit", lit(1))
    docs
      .select(col(idCol), explode_outer(Dedup.shingles(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("gram")).as("n_grams"),
        count(col("bench_hit")).as("n_overlap"))
      .withColumn("contaminated", (col("n_overlap") > 0).cast("int"))
  }
}
