package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-describing dataset writes — the "dataset card" a training run
  * records next to every shard drop: row count, schema, and an
  * ORDER-INDEPENDENT content fingerprint (bit_xor of per-row
  * xxhash64 over all columns), so a re-read can prove it is looking
  * at exactly the rows that were written — across any partitioning,
  * any file order, any engine rewrite of the layout.
  *
  * bit_xor, not sum: xor aggregates in any order without overflow
  * (ANSI-mode sum(long) throws at wrap), and a single changed,
  * dropped, or duplicated-odd-times row flips the fingerprint.
  * Limitation, stated: a row duplicated an EVEN number of times
  * cancels out — pair the fingerprint with the row count, which such
  * a corruption moves.
  *
  * The manifest itself is one small JSON file written by the driver —
  * metadata, not data; at 100 TB it is still one file.
  */
object DatasetManifest {

  final case class Manifest(rows: Long, contentHash: Long, schemaDdl: String)

  private def fingerprint(df: DataFrame): Manifest = {
    val h = df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(count(lit(1)).as("n"), bit_xor(col("h")).as("x"))
      .collect()(0)
    Manifest(h.getLong(0), if (h.isNullAt(1)) 0L else h.getLong(1), df.schema.toDDL)
  }

  private def manifestPath(dataPath: String) =
    Paths.get(dataPath, "_graft_manifest.json")

  /** Write `df` as parquet at `path` plus `_graft_manifest.json`. */
  def write(df: DataFrame, path: String): Manifest = {
    df.write.mode("overwrite").parquet(path)
    // fingerprint the WRITTEN files, not the input plan — the manifest
    // must attest to what landed on disk
    val m = fingerprint(df.sparkSession.read.parquet(path))
    val json =
      s"""{"rows": ${m.rows}, "content_hash": ${m.contentHash}, "schema": ${quote(m.schemaDdl)}}"""
    Files.write(manifestPath(path), json.getBytes(StandardCharsets.UTF_8))
    m
  }

  /** Re-read `path`, recompute the fingerprint, compare to the stored
    * manifest. Returns the pair (stored, actual); they match iff the
    * dataset is exactly what was written.
    */
  def verify(spark: SparkSession, path: String): (Manifest, Manifest) = {
    val raw = new String(Files.readAllBytes(manifestPath(path)), StandardCharsets.UTF_8)
    val stored = parse(raw)
    val actual = fingerprint(spark.read.parquet(path))
    (stored, actual)
  }

  // minimal JSON for the three known fields — no library on the classpath
  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def parse(json: String): Manifest = {
    def longField(name: String): Long =
      s""""$name":\\s*(-?\\d+)""".r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(s"manifest missing $name"))
        .group(1).toLong
    val schema = s""""schema":\\s*"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException("manifest missing schema"))
      .group(1).replace("\\\"", "\"").replace("\\\\", "\\")
    Manifest(longField("rows"), longField("content_hash"), schema)
  }
}
