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
  /** `events.ts` is TIMESTAMP(NANOS) in the parquet; under
    * `spark.sql.legacy.parquet.nanosAsLong` it arrives as a long which we
    * convert to a microsecond timestamp (integer `div` — no double
    * round-trip, nanos exceed 2^53). Matches DuckDB's ns→µs truncation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
