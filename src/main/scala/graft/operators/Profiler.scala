package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Two-pass table profiling: per-column null counts, exact distincts,
  * min/max — the engine-side generalization of the reference's runtime
  * counter checks (`etl/cargar_postgres.py:367-371`, SURVEY.md §5.2).
  *
  * The plain aggregates (nulls/min/max/count) and the exact distincts
  * run as SEPARATE jobs on purpose: mixing distinct and non-distinct
  * aggregates makes Catalyst plan an Expand that multiplies every scan
  * row by (n_distinct_aggs + 1) and drags all the plain buffers
  * through the blow-up — measured 3× slower than two clean passes at
  * sf0.1 (6.5 s vs 2.1 s on a 3-column lineitem slice). Each split
  * pass keeps full map-side partial aggregation: the plain pass ships
  * one row per task, the distinct pass ships per-partition-deduped
  * values. Output is long-format (one row per column) so schema is
  * stable regardless of the profiled table.
  */
object Profiler {

  /** (col_name, n_rows, n_nulls, n_distinct, min_str, max_str) per column. */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cols = df.schema.fields
    val plainAggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
    } :+ count(lit(1)).as("__total")
    val distinctAggs = cols.map { f =>
      count_distinct(col(f.name)).as(s"${f.name}__distinct")
    }
    val row = df.agg(plainAggs.head, plainAggs.tail.toIndexedSeq: _*).collect()(0)
    val dRow = df.agg(distinctAggs.head, distinctAggs.tail.toIndexedSeq: _*).collect()(0)
    val total = row.getAs[Long]("__total")
    import spark.implicits._
    cols.map { f =>
      (f.name,
        total,
        row.getAs[Long](s"${f.name}__nulls"),
        dRow.getAs[Long](s"${f.name}__distinct"),
        Option(row.getAs[String](s"${f.name}__min")).getOrElse(""),
        Option(row.getAs[String](s"${f.name}__max")).getOrElse(""))
    }.toSeq.toDF("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }
}
