package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Good/bad row routing — the engine face of the reference's
  * validity-filter + dropped-count logging
  * (`etl/transformar_mensual.py:149`, `etl/cargar_postgres.py:365-374`):
  * instead of silently discarding rows that fail validation, keep them
  * queryable in a quarantine with the reason attached.
  *
  * `split` evaluates every rule once per row (one pass, no
  * double-scan): rows failing any rule land in `bad` with the list of
  * failed rule names; `good` carries the rest. The two frames share
  * one lineage — persist the tagged frame if both sides are consumed.
  */
object Quarantine {

  final case class Split(good: DataFrame, bad: DataFrame, tagged: DataFrame) {
    def release(): Unit = { tagged.unpersist(); () }
  }

  /** rules: name → predicate a VALID row satisfies. */
  def split(df: DataFrame, rules: Seq[(String, Column)]): Split = {
    require(rules.nonEmpty, "at least one rule")
    val failed = array_compact(array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*))
    val tagged = df.withColumn("_failed_rules", failed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Split(
      good = tagged.filter(size(col("_failed_rules")) === 0).drop("_failed_rules"),
      bad = tagged.filter(size(col("_failed_rules")) > 0)
        .withColumnRenamed("_failed_rules", "failed_rules"),
      tagged = tagged)
  }

  /** Per-rule failure counts in one aggregate (the reference's per-FK
    * dropped-row log lines, as a frame).
    */
  def failureCounts(split: Split): DataFrame = {
    val bad = split.bad
    bad.select(explode(col("failed_rules")).as("rule"))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n_failures"))
  }
}
