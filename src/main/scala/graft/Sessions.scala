package graft

import org.apache.spark.sql.SparkSession

/** Shared local-mode session factory: one place for the configs every
  * entrypoint (Verify, Bench, tests) must agree on.
  *
  * - shuffle.partitions = cores (not the 200 default — local mode).
  * - UTC session time zone (oracle parity).
  * - AQE on: runtime coalescing/skew handling — the same settings that
  *   would carry to a real cluster.
  * - `nanosAsLong`: the driver testdata's `events.ts` is
  *   TIMESTAMP(NANOS) which Spark 4 otherwise refuses to read;
  *   [[Tables.events]] converts the long back to a microsecond
  *   timestamp.
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
