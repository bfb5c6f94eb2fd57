package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partition-layout pruning evidence — the scan-elimination lever that
  * decides whether a 100 TB partitioned fact reads 100 TB or one
  * partition's worth:
  *
  *  - STATIC pruning: a literal predicate on the partition column must
  *    land in PartitionFilters and cut the scan to one directory.
  *  - DYNAMIC partition pruning (DPP): when the selective predicate
  *    lives on a JOINED dim, Spark must inject the runtime
  *    `dynamicpruningexpression` subquery on the fact's partition
  *    column — the fact never enumerates partitions the filtered dim
  *    can't reach.
  *
  * Both asserted on the physical plan AND by result equality against
  * the unpartitioned computation.
  */
class PartitionPruningSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("static + dynamic partition pruning on a year-partitioned fact") {
    val out = Files.createTempDirectory("graft_dpp").toString
    Tables.orders(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    val fact = spark.read.parquet(out)

    // static: literal partition predicate reaches PartitionFilters
    val st = fact.filter(col("o_year") === 1996)
      .agg(count(lit(1)).as("n"))
    val stPlan = st.queryExecution.executedPlan.toString
    assert(stPlan.contains("PartitionFilters"), stPlan.take(2000))
    assert(stPlan.contains("(o_year"), "partition predicate must be in the scan")
    val expected = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(st.collect().head.getLong(0) == expected)

    // dynamic: the selective predicate lives on the joined dim — the
    // fact scan must carry a dynamicpruningexpression subquery. The
    // dim must be FILE-based: a local relation constant-folds its
    // filter away before the PartitionPruning rule looks for a
    // selective predicate (measured — LocalTableScan gets no DPP).
    import spark.implicits._
    val dimPath = Files.createTempDirectory("graft_dpp_dim").toString
    Seq((1996, "target"), (1997, "other"), (1998, "other"))
      .toDF("d_year", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = fact
      .join(dim.filter(col("tag") === "target"),
        col("o_year") === col("d_year"))
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"DPP subquery missing from the fact scan:\n${plan.take(3000)}")
    assert(q.collect().head.getLong(0) == expected,
      "DPP-pruned join must equal the unpartitioned computation")
  }
}
