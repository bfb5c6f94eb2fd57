package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Class-balanced corpus sampling: cap every stratum (language, source,
  * topic, …) at `n` rows, selected DETERMINISTICALLY — the md5-order
  * analog of "take a uniform random n per class", reproducible across
  * engines, partitionings, and incremental re-runs (same contract as
  * [[HashSample]], which does fraction-based global sampling).
  *
  * Selection: within each stratum keep the `n` rows whose
  * `md5(key)` sorts lowest (key tiebreak) — an unbiased uniform
  * choice since md5 is uniform and key-pure.
  *
  * Scale shape: ONE shuffle keyed by the strata columns + a per-group
  * local sort — no global sort, no driver participation. For a
  * pathologically hot stratum (one class = half the corpus), compose
  * with [[HashSample.accept]] first: a map-side pre-prune at fraction
  * `c·n/|stratum|` bounds the sorted group to ~c·n rows while keeping
  * the SAME final selection (the n smallest hashes survive any prefix
  * prune that keeps ≥ n of them).
  */
object StratifiedSample {

  /** ≤ `n` rows per distinct value-tuple of `strataCols`, chosen by
    * md5(`keyCol`) order; adds nothing, drops nothing else.
    *
    * CONTRACT: `keyCol` must be UNIQUE and NON-NULL (a row id, like
    * [[DenseId]]'s input). Duplicate keys tie on both sort keys and
    * row_number breaks the tie by partition arrival order — the
    * selection would no longer be a pure function of the keys; null
    * keys additionally sort FIRST in Spark but LAST in most SQL
    * engines, breaking cross-engine twins.
    */
  def capPerStratum(
      df: DataFrame, strataCols: Seq[String], keyCol: String, n: Int): DataFrame = {
    require(strataCols.nonEmpty, "strata columns required")
    require(n > 0, "cap must be positive")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("_stratum_rn", row_number().over(w))
      .filter(col("_stratum_rn") <= n)
      .drop("_stratum_rn")
  }
}
