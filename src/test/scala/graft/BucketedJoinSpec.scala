package graft


import org.apache.spark.sql.functions._

/** Bucketing = the scale story for repeated fact⋈fact joins (SCALE.md):
  * both sides pre-partitioned and sorted by the join key at write time
  * → sort-merge join with NO exchange at read time. This is the plan
  * shape a 100 TB lineitem⋈orders pipeline relies on.
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed tables join without a shuffle exchange") {
    // default in-memory catalog + ./spark-warehouse (gitignored)
    val dir = "/root/testdata/sf0.001"

    Tables.lineitem(spark, dir)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, dir)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // join itself must not reshuffle either side; the only exchange
      // allowed is the one feeding the final aggregation
      val joinPart = plan.split("SortMergeJoin")(0)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val exchanges = plan.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      assert(exchanges <= 1, s"join sides reshuffled:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
