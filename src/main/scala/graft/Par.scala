package graft

import org.apache.spark.sql.DataFrame

/** Input-parallelism hygiene. Operators in this engine are pure plans
  * — they never repartition their input (an internal shuffle would tax
  * every well-partitioned real corpus). But a narrow input (one small
  * file, a collected literal frame) serializes every downstream
  * per-row kernel onto a handful of cores; the INPUT layer decides
  * when a cheap round-robin fan-out beats that.
  *
  * Measured rule of thumb (sf0.1 sweep): fan out ONLY when the per-row
  * kernel work downstream clearly dominates one extra shuffle of the
  * input — e.g. the corpus_curation lang+quality pass (interpreted HOF
  * kernels, 1.9 s single-core vs 0.55 s fanned). For cheap kernels
  * (md5 groupBy, shingle hashing, vector dots at 64 dims) the added
  * exchange + AQE round-trip LOSES time; the engine's wide operators
  * redistribute at their first shuffle anyway. Applied accordingly:
  * one call site (curation); everything else measured and declined.
  */
object Par {

  /** Round-robin `df` to the session's default parallelism when its
    * current partitioning uses at most half the cores; pass through
    * unchanged otherwise.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }
}
