package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Schema evolution on the lake path — the operational reality of a
  * corpus that gains columns over time (a new quality signal, a new
  * provenance field): old parquet files must stay readable next to
  * new ones, with the widened schema and nulls where history has no
  * value. Pins Spark's `mergeSchema` contract so a writer adding a
  * column never strands earlier shards.
  */
class SchemaEvolutionSpec extends SparkSuite {
  import spark.implicits._

  test("mergeSchema reads v1+v2 shards as the union schema with nulls for history") {
    val root = Files.createTempDirectory("schemaevo").resolve("docs").toString
    // v1 shard: (doc_id, text)
    Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(root)
    // v2 shard adds a quality column
    Seq((2L, "gamma", 0.9), (3L, "delta", 0.4)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(root)

    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet == Set("doc_id", "text", "quality"))
    val rows = merged.orderBy("doc_id").collect()
    assert(rows.length == 4)
    // history reads as null quality; new shards carry their values
    assert(rows(0).isNullAt(rows(0).fieldIndex("quality")))
    assert(rows(2).getAs[Double]("quality") == 0.9)
    // filters on the evolved column skip history without error (3VL)
    assert(merged.filter($"quality" >= 0.5).count() == 1)
    // aggregation over the union schema sees only present values
    assert(merged.agg(count($"quality")).head().getLong(0) == 2L)
  }

  test("without mergeSchema a single-footer read still works per shard") {
    val root = Files.createTempDirectory("schemaevo2").resolve("docs").toString
    Seq((0L, "alpha")).toDF("doc_id", "text").write.mode("append").parquet(root)
    Seq((1L, "beta", 1.0)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(root)
    // default read picks one footer; doc_id/text are always present
    val d = spark.read.parquet(root).select("doc_id", "text")
    assert(d.count() == 2)
  }
}
