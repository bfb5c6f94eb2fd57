package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Per-entity time-series repair: spine densification and gap filling
  * over the event stream. The reference's time handling stops at
  * extraction predicates (SURVEY §2 P6/P7) and the month spine
  * (`etl/carga_a_BD.py` grain); these queries add the repair step every
  * downstream forecaster needs — a dense per-key calendar with missing
  * points filled deterministically.
  */
object TimeSeriesQueries {

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // LINEAR-INTERPOLATION gap fill per (user, day): densify each
    // user's activity series over its own [min_day, max_day] spine
    // (sequence+explode — never a global calendar cross join), then
    // fill missing days from the bracketing observations with one
    // carry-forward and one carry-backward IGNORE NULLS window:
    // filled = prev + (next − prev) · (Δdays / gap), every operand
    // cast to double in the SAME textual order on both engines (IEEE
    // ± and × are deterministic, so the doubles hash-match). Windows
    // partition by user — bounded per-key state, no global sort; the
    // identical plan runs at any key count.
    "gap_fill_interpolate" -> QueryDef(
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val spine = daily
          .groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
        val wUp = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wDown = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        spine.join(daily, Seq("user_id", "day"), "left")
          .withColumn("pd",
            last(when(col("n").isNotNull, col("day")), ignoreNulls = true)
              .over(wUp))
          .withColumn("pn", last(col("n"), ignoreNulls = true).over(wUp))
          .withColumn("nd",
            first(when(col("n").isNotNull, col("day")), ignoreNulls = true)
              .over(wDown))
          .withColumn("nn", first(col("n"), ignoreNulls = true).over(wDown))
          .select(col("user_id"), col("day"),
            col("n").isNull.as("interpolated"),
            when(col("n").isNotNull, col("n").cast("double"))
              .otherwise(col("pn").cast("double") +
                (col("nn").cast("double") - col("pn").cast("double")) *
                  (datediff(col("day"), col("pd")).cast("double") /
                    datediff(col("nd"), col("pd")).cast("double")))
              .as("n_filled"))
          .orderBy(col("user_id"), col("day"))
      },
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT b.user_id,
        |    CAST(unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds b),
        |j AS (
        |  SELECT s.user_id, s.day, d.n FROM spine s
        |  LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day),
        |w AS (
        |  SELECT user_id, day, n,
        |    last_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |    last_value(n IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pn,
        |    first_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
        |    first_value(n IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nn
        |  FROM j)
        |SELECT user_id, day, n IS NULL AS interpolated,
        |  CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
        |       ELSE CAST(pn AS DOUBLE) + (CAST(nn AS DOUBLE) - CAST(pn AS DOUBLE)) *
        |         (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)) END AS n_filled
        |FROM w ORDER BY user_id, day""".stripMargin)
  )
}
