package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass table profiling: per-column null counts, exact distincts,
  * min/max — the engine-side generalization of the reference's runtime
  * counter checks (`etl/cargar_postgres.py:367-371`, SURVEY.md §5.2).
  *
  * Everything is a single aggregate over one scan (no per-column jobs);
  * output is long-format (one row per column) so schema is stable
  * regardless of the profiled table.
  */
object Profiler {

  /** (col_name, n_rows, n_nulls, n_distinct, min_str, max_str) per column. */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        count_distinct(c).as(s"${f.name}__distinct"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getAs[Long]("__total")
    import spark.implicits._
    cols.map { f =>
      (f.name,
        total,
        row.getAs[Long](s"${f.name}__nulls"),
        row.getAs[Long](s"${f.name}__distinct"),
        Option(row.getAs[String](s"${f.name}__min")).getOrElse(""),
        Option(row.getAs[String](s"${f.name}__max")).getOrElse(""))
    }.toSeq.toDF("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }
}
