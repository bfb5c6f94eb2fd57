package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Hash

/** Temperature-scaled mixture resampling at α = 0.5 — the multilingual
  * smoothing rule (rate ∝ group-share^α) that upsamples tail groups
  * and downsamples head groups relative to proportional sampling
  * (mBERT's exponential smoothing; XLM-R uses the same shape). α is
  * pinned to 0.5 because `sqrt` is the one power IEEE defines as
  * correctly rounded — a general `pow` is library-dependent and could
  * never be bit-reproduced against another engine (see CLAUDE.md).
  *
  * 100 TB shape: one tiny groupBy for group sizes, a 1-row fold for
  * the denominator, then a broadcast threshold join and a map-side
  * md5 accept test — the corpus is scanned once, nothing but the
  * O(groups) summary ever shuffles, and the accept decision is a pure
  * function of the key (append-stable, layout-independent, identical
  * on Spark and DuckDB).
  *
  * Determinism of the float chain: group sizes are exact longs; the
  * denominator folds sqrt(n_g) in group-ASC order (the same left fold
  * both engines); each rate is `((budget * sqrt(n_g)) / denom) / n_g`
  * in that textual order; thresholds are `floor(p * 2^53)` compared
  * against the top 53 bits of md5 — every step ×,÷,sqrt,floor on
  * exact inputs, so thresholds are bit-identical across engines.
  */
object TemperatureSample {

  /** 2^53 — thresholds live in the exactly-representable double range. */
  private val Two53 = 9007199254740992.0

  /** Select ~`budget` docs with per-group rate ∝ sqrt(group size).
    * Returns the selected rows of `docs` (all columns).
    */
  def select(docs: DataFrame, idCol: String, groupCol: Column, budget: Double): DataFrame = {
    val grouped = docs.withColumn("__grp", groupCol)
    val counts = grouped.groupBy(col("__grp")).agg(count(lit(1)).as("n_docs"))
    val denom = counts.agg(
      aggregate(
        array_sort(collect_list(struct(col("__grp").as("g"), col("n_docs").as("n")))),
        lit(0.0),
        (acc, x) => acc + sqrt(x.getField("n").cast("double"))).as("denom"))
    val thresholds = counts
      .crossJoin(broadcast(denom))
      .select(
        col("__grp"),
        floor(
          least(
            (lit(budget) * sqrt(col("n_docs").cast("double")) / col("denom")) /
              col("n_docs").cast("double"),
            lit(1.0)) * lit(Two53)).cast("long").as("__thr"))
    grouped
      .join(broadcast(thresholds), Seq("__grp"))
      .filter(shiftright(Md5Hash.lower63Col(col(idCol).cast("string")), 10) < col("__thr"))
      .drop("__grp", "__thr")
  }

  /** DuckDB twin of the threshold chain, for oracle SQL: emits a CTE
    * body computing (grp, thr) from `(SELECT <grpExpr> AS grp FROM
    * <from>)`. The md5 accept test is the caller's (needs the md5_63
    * helper of the query module).
    */
  def thresholdsSql(fromSql: String, grpExpr: String, budget: Double): String =
    s"""tsc AS (SELECT $grpExpr AS grp, CAST(count(*) AS BIGINT) AS n_docs
       |        FROM $fromSql GROUP BY 1),
       |tsd AS (SELECT list_reduce(
       |          list_prepend(CAST(0.0 AS DOUBLE), list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY grp)),
       |          (a, b) -> a + b) AS denom FROM tsc),
       |tst AS (SELECT tsc.grp,
       |          CAST(floor(least((($budget * sqrt(CAST(tsc.n_docs AS DOUBLE)) / tsd.denom))
       |            / CAST(tsc.n_docs AS DOUBLE), 1.0) * 9007199254740992.0) AS BIGINT) AS thr
       |        FROM tsc, tsd)""".stripMargin
}
