package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling: accept a row iff the md5
  * hex digest of its key sorts below a fraction-derived threshold.
  *
  * Unlike `df.sample()` (partitioning-dependent RNG) or `TABLESAMPLE`
  * (engine-specific), the accept decision is a pure function of the
  * key: the same rows are selected on 1 executor or 1000, on Spark or
  * DuckDB, today or in next month's incremental batch — which is what
  * a reproducible training-data pipeline needs. Map-only: no shuffle,
  * fully pushed into the scan stage.
  *
  * md5's first 8 hex chars are uniform over [0, 2^32), so
  * P(md5(key) < threshold(f)) = f to within 2^-32, exact per key set.
  */
object HashSample {

  /** Lowercase 32-hex-char threshold for an accept fraction. */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    if (fraction >= 1.0) "g" * 32 // sorts above every hex digest
    else f"${(fraction * 4294967296.0).toLong}%08x" + "0" * 24
  }

  /** Accept predicate on an arbitrary key expression (cast to string). */
  def accept(key: Column, fraction: Double): Column =
    md5(key.cast("string")) < lit(thresholdHex(fraction))

  /** Sample rows of `df` by hashing `keyCols` (joined with '-'). */
  def sample(df: DataFrame, keyCols: Seq[String], fraction: Double): DataFrame =
    df.filter(accept(concat_ws("-", keyCols.map(col): _*), fraction))

  /** Deterministic train/val/test-style split assignment: each row's
    * split is chosen by where its key's md5 digest falls among the
    * cumulative-fraction cut points — e.g.
    * `Seq("train" -> 0.8, "val" -> 0.9)` with `rest = "test"`.
    * A pure per-key function like [[accept]]: map-only, reproducible
    * across engines/cluster sizes, and stable under incremental
    * appends (new rows never move old rows between splits — the
    * property a 100 TB corpus refresh needs).
    */
  def assignSplits(
      key: Column, cuts: Seq[(String, Double)], rest: String): Column = {
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cut points must ascend")
    val h = md5(key.cast("string"))
    cuts.foldRight(lit(rest)) { case ((name, cum), elseCol) =>
      when(h < lit(thresholdHex(cum)), name).otherwise(elseCol)
    }
  }

  /** DuckDB CASE twin of [[assignSplits]] over a SQL key expression. */
  def assignSplitsSql(
      keyExpr: String, cuts: Seq[(String, Double)], rest: String): String =
    cuts.map { case (name, cum) =>
      s"WHEN md5(CAST($keyExpr AS VARCHAR)) < '${thresholdHex(cum)}' THEN '$name'"
    }.mkString("CASE ", " ", s" ELSE '$rest' END")
}
