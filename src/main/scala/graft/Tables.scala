package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver testdata directories
  * (TESTDATA.md: region nation customer supplier part orders lineitem
  * events documents embeddings — one parquet file per table).
  *
  * Reads are plain `spark.read.parquet` so Catalyst column pruning and
  * filter pushdown reach the scan; callers must NOT cache/collect here.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** `events.ts` normalization. The driver has generated this column as
    * TIMESTAMP(NANOS) (arrives as a long under
    * `spark.sql.legacy.parquet.nanosAsLong`: integer-`div` to µs, no double
    * round-trip — nanos exceed 2^53, matches DuckDB's ns→µs truncation) and
    * as plain timestamp[us] with isAdjustedToUTC=false (arrives as
    * TIMESTAMP_NTZ under Spark 4's `inferTimestampNTZ` default: cast to
    * session-tz TIMESTAMP — the session is pinned to UTC in Sessions, so the
    * cast preserves the microsecond value bit-for-bit and matches DuckDB's
    * naive-timestamp read). Downstream queries always see TIMESTAMP.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // cast to the TYPE, not the "timestamp" type STRING: the string
      // resolves through spark.sql.timestampType, so a session pinned
      // to TIMESTAMP_NTZ would silently turn this cast into a no-op.
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
