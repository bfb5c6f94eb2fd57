package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus ingest — the training-data wire format (one JSON doc
  * per line, typically gz-compressed shards). Counterpart of the
  * reference's defensive CSV scan ([[CsvIngest]],
  * `etl/transformar_mensual.py:131-179`) for the corpus side of the
  * house: same contract of "bad lines must not kill a 100 TB load,
  * and must not vanish silently either".
  *
  * Implementation: a TEXT scan + `from_json` against an explicit
  * schema (never inferred — inference is a full extra pass and lets
  * one malformed shard silently widen a column for the whole corpus).
  * Parsing per line rather than via the JSON file relation keeps the
  * raw line first-class: Spark's JSON relation refuses any query whose
  * references reduce to the internal corrupt-record column alone
  * (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is exactly what a
  * quarantine audit (`quarantine.count()`) does. Both halves come from
  * ONE map-only parse:
  *
  *  - `good`: rows whose parse produced no corrupt-record marker;
  *  - `quarantine`: (raw_line, partial parse) per failed row — kept
  *    for re-ingest after a fix, the JSONL analog of [[ParquetMerge]]'s
  *    quarantine contract.
  *
  * gz shards parallelize per FILE (gzip is not splittable — shard the
  * corpus, don't concat it); plain `.jsonl` by block.
  */
object JsonlIngest {

  final case class Split(good: DataFrame, quarantine: DataFrame)

  private val CorruptCol = "_graft_corrupt"

  /** One-scan good/quarantine split of a JSONL path under `schema`. */
  def apply(spark: SparkSession, path: String, schema: StructType): Split = {
    require(!schema.fieldNames.contains(CorruptCol), s"$CorruptCol is reserved")
    val withCorrupt = schema.add(CorruptCol, StringType)
    val parsed = spark.read.text(path)
      .select(
        col("value").as("raw_line"),
        from_json(
          col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol))
          .as("rec"))
    Split(
      good = parsed
        .filter(col("rec").isNotNull && col(s"rec.$CorruptCol").isNull)
        .select(schema.fieldNames.map(f => col(s"rec.$f").as(f)).toIndexedSeq: _*),
      quarantine = parsed
        .filter(col("rec").isNull || col(s"rec.$CorruptCol").isNotNull)
        .select(
          col("raw_line") +:
            schema.fieldNames.map(f => col(s"rec.$f").as(f)).toIndexedSeq: _*))
  }
}
