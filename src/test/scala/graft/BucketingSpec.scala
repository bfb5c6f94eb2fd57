package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed-table layout: joins and aggregations on the bucket key
  * must plan WITHOUT a shuffle exchange (and, with sorted single-file
  * buckets, without a sort), and produce the same rows as the
  * unbucketed formulation.
  */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // two "large" sides so the join can't broadcast away the point
  private def facts = spark.range(0, 20000).select(
    (col("id") % 997).as("k"), (col("id") * 3).as("a"))
  private def other = spark.range(0, 10000).select(
    (col("id") % 997).as("k"), (col("id") + 7).as("b"))

  test("co-located join: two same-bucketed tables join with no exchange and no sort") {
    val base = Files.createTempDirectory("bucketing").toString
    Bucketing.writeBucketed(facts, "bk_facts", s"$base/facts", 8, Seq("k"))
    Bucketing.writeBucketed(other, "bk_other", s"$base/other", 8, Seq("k"))
    try withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // off by default since 3.0 (requires a file-listing check that
      // each bucket is a single file — which writeBucketed guarantees);
      // with it on, the scan reports the sortBy order and SMJ plans
      // with no SortExec at all
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
      val joined = Bucketing.read(spark, "bk_facts")
        .join(Bucketing.read(spark, "bk_other"), Seq("k"))
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(!plan.contains("Sort ["), s"sorted buckets still re-sort:\n$plan")

      // same rows as the unbucketed join (spot-check via aggregates —
      // full collect of ~200k joined rows is wasted test time)
      val gotAgg = joined.agg(
        count(lit(1)), sum(col("a") + col("b")), sum(col("k"))).head()
      val expAgg = facts.join(other, Seq("k")).agg(
        count(lit(1)), sum(col("a") + col("b")), sum(col("k"))).head()
      assert(gotAgg == expAgg)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_facts")
      spark.sql("DROP TABLE IF EXISTS bk_other")
    }
  }

  test("aggregation on the bucket key plans with no exchange") {
    val base = Files.createTempDirectory("bucketing_agg").toString
    Bucketing.writeBucketed(facts, "bk_agg", s"$base/t", 8, Seq("k"))
    try {
      val agg = Bucketing.read(spark, "bk_agg").groupBy("k").agg(sum("a").as("s"))
      val plan = planOf(agg)
      assert(!plan.contains("Exchange"), s"bucketed agg still shuffles:\n$plan")
      // and the numbers match the shuffled formulation
      val got = agg.orderBy("k").collect()
      val exp = facts.groupBy("k").agg(sum("a").as("s")).orderBy("k").collect()
      assert(got.sameElements(exp))
    } finally spark.sql("DROP TABLE IF EXISTS bk_agg")
  }

  test("mismatched bucket counts coalesce (8⋈4) instead of shuffling") {
    val base = Files.createTempDirectory("bucketing_mismatch").toString
    Bucketing.writeBucketed(facts, "bk_8", s"$base/f8", 8, Seq("k"))
    Bucketing.writeBucketed(other, "bk_4", s"$base/o4", 4, Seq("k"))
    try withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.bucketing.coalesceBucketsInJoin.enabled" -> "true") {
      val joined = Bucketing.read(spark, "bk_8")
        .join(Bucketing.read(spark, "bk_4"), Seq("k"))
      val plan = planOf(joined)
      assert(!plan.contains("Exchange"),
        s"coalesced bucket join still shuffles:\n$plan")
      assert(joined.count() ==
        facts.join(other, Seq("k")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_8")
      spark.sql("DROP TABLE IF EXISTS bk_4")
    }
  }

  test("one file per bucket (no task×bucket small-file blowup)") {
    val base = Files.createTempDirectory("bucketing_files").toString
    Bucketing.writeBucketed(facts, "bk_files", s"$base/t", 8, Seq("k"))
    try {
      val files = new java.io.File(s"$base/t").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      assert(files.length == 8,
        s"expected exactly 8 bucket files, got ${files.length}")
    } finally spark.sql("DROP TABLE IF EXISTS bk_files")
  }
}
