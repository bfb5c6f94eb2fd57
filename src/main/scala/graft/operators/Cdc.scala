package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators for incremental warehouse loads — the
  * scale path the reference approximates with idempotent re-runs
  * (`ON CONFLICT DO NOTHING`, `etl/cargar_postgres.py:135,248`): at
  * 100 TB you diff or window the *changes*, not re-scan the world.
  *
  * [[Scd2]] turns an append-only attribute change log into type-2
  * slowly-changing-dimension rows (validity intervals). [[SnapshotDiff]]
  * classifies inserted/updated/deleted keys between two full snapshots.
  * Both are pure DataFrame plans: one shuffle each (window partition /
  * outer-join key), no driver participation, exact semantics — every
  * result is DuckDB-oracle-checkable.
  */
object Scd2 {

  /** Change log → SCD2 history.
    *
    * Input: one row per observation (key, ts, attrs...). Output: one
    * row per *change* with `valid_from` (change ts), `valid_to` (next
    * change ts, null while current) and `is_current`. Consecutive
    * observations with identical attributes collapse into one interval
    * (a re-observed unchanged row is not a change).
    *
    * `tieBreak` orders same-timestamp observations deterministically.
    * One shuffle: everything is windows over (key, order).
    */
  def fromChangeLog(
      changes: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      tsCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs required")
    val ord = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val byKey = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    val changed = changes
      .withColumn("_prev", lag(attrs, 1).over(byKey))
      // first observation, or any attribute differing from the previous
      // (null-safe: <=> treats null = null as equal)
      .filter(col("_prev").isNull || !(attrs <=> col("_prev")))
      .drop("_prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}

object SnapshotDiff {

  /** Classify rows between two snapshots of the same table.
    *
    * Output: key columns + `change_type` ('I' in new only, 'D' in old
    * only, 'U' present in both with any compare column differing;
    * unchanged rows are omitted) + the new snapshot's compare values
    * (null for 'D'). One shuffle: a full outer join on the key.
    * Null-safe comparison throughout.
    */
  def diff(
      oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty, "keys and compare cols required")
    val o = oldSnap.select((keyCols ++ compareCols).map(c => col(c).as(s"_o_$c")): _*)
    val n = newSnap.select((keyCols ++ compareCols).map(c => col(c).as(s"_n_$c")): _*)
    val cond = keyCols.map(k => o(s"_o_$k") <=> n(s"_n_$k")).reduce(_ && _)
    val inOld = keyCols.map(k => col(s"_o_$k").isNotNull).reduce(_ || _)
    val inNew = keyCols.map(k => col(s"_n_$k").isNotNull).reduce(_ || _)
    val same = compareCols.map(c => col(s"_o_$c") <=> col(s"_n_$c")).reduce(_ && _)
    o.join(n, cond, "full_outer")
      .withColumn("change_type",
        when(!inOld, lit("I"))
          .when(!inNew, lit("D"))
          .when(!same, lit("U")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(k => coalesce(col(s"_n_$k"), col(s"_o_$k")).as(k)) ++
        Seq(col("change_type")) ++
        compareCols.map(c => col(s"_n_$c").as(c)): _*)
  }
}
