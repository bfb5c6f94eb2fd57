package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Quarantine
import graft.sources.ParquetMerge

class MergeQuarantineSpec extends SparkSuite {
  import spark.implicits._

  test("parquet upsert: insert, update (last wins), survivors untouched, idempotent") {
    val target = Files.createTempDirectory("merge").toString + "/t"
    // initial load on empty target
    ParquetMerge.upsert(spark, target,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v"), Seq("k"))
    // update k=2, insert k=3; duplicate update rows for k=3 -> max-struct wins
    ParquetMerge.upsert(spark, target,
      Seq((2L, "b2", 21.0), (3L, "c", 30.0), (3L, "c", 29.0)).toDF("k", "s", "v"), Seq("k"))
    val got = spark.read.parquet(target).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0)))
    // replaying the same update batch changes nothing
    ParquetMerge.upsert(spark, target,
      Seq((2L, "b2", 21.0), (3L, "c", 30.0), (3L, "c", 29.0)).toDF("k", "s", "v"), Seq("k"))
    assert(spark.read.parquet(target).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq == got.toSeq)
  }

  test("parquet upsert: recovers a crash between the two swap renames") {
    val target = Files.createTempDirectory("merge_crash").toString + "/t"
    ParquetMerge.upsert(spark, target,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v"), Seq("k"))
    // simulate a kill after target moved aside but before tmp renamed
    // in: the corpus survives ONLY at *_old
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(target),
      new org.apache.hadoop.fs.Path(target + "_old")))
    // next upsert must restore the old corpus, not rebuild from the batch
    ParquetMerge.upsert(spark, target,
      Seq((3L, "c", 30.0)).toDF("k", "s", "v"), Seq("k"))
    val got = spark.read.parquet(target).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)),
      "pre-crash rows must survive recovery")
  }

  test("quarantine: one-pass split with per-rule reasons and counts") {
    val df = Seq(
      (1, 2020, 6),   // valid
      (2, 0, 6),      // bad year
      (3, 2020, 13),  // bad month
      (4, -1, 0)      // both
    ).toDF("id", "ano", "mes")
    val s = Quarantine.split(df, Seq(
      "year_positive" -> (col("ano") > 0),
      "month_1_12" -> col("mes").between(1, 12)))
    assert(s.good.select("id").as[Int].collect().toSeq == Seq(1))
    val bad = s.bad.select(col("id"), col("failed_rules"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toSet).toMap
    assert(bad == Map(
      2 -> Set("year_positive"),
      3 -> Set("month_1_12"),
      4 -> Set("year_positive", "month_1_12")))
    val counts = Quarantine.failureCounts(s)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("year_positive" -> 2L, "month_1_12" -> 2L))
    s.release()
  }

  test("quarantine: null predicate result routes to bad (not silently good)") {
    val df = Seq((1, Some(5)), (2, None)).toDF("id", "x")
    val s = Quarantine.split(df, Seq("x_positive" -> (col("x") > 0)))
    assert(s.good.select("id").as[Int].collect().toSeq == Seq(1))
    assert(s.bad.select("id").as[Int].collect().toSeq == Seq(2))
    s.release()
  }
}
