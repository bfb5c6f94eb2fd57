package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** ORC as the alternate columnar lake format: round-trip fidelity,
  * predicate pushdown, and column pruning — the same scan-efficiency
  * contract the parquet path is held to (PLANS.md), so a deployment
  * standardized on ORC loses nothing.
  */
class OrcFormatSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("ORC round-trip preserves rows; scan prunes columns and pushes filters") {
    val src = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    val out = Files.createTempDirectory("orcfmt").resolve("orders_orc").toString
    src.write.mode("overwrite").orc(out)

    val back = spark.read.orc(out)
    assert(back.count() == src.count())
    // value fidelity on a deterministic aggregate
    val a = src.agg(sum($"o_orderkey"), count(lit(1))).head()
    val b = back.agg(sum($"o_orderkey"), count(lit(1))).head()
    assert(a == b)

    val q = back.filter($"o_orderstatus" === "F").select($"o_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_orderstatus"), s"filter not pushed:\n$plan")
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // pruned scan: only the two referenced columns reach ReadSchema
    val read = formatted.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("o_orderkey") && read.contains("o_orderstatus") &&
      !read.contains("o_totalprice"), read)
    assert(q.count() == src.filter($"o_orderstatus" === "F").count())
  }

  test("ORC partitioned write prunes partitions at read") {
    val src = Tables.orders(spark, dir)
      .select($"o_orderkey", year($"o_orderdate").as("yr"))
    val out = Files.createTempDirectory("orcfmt").resolve("orders_by_year").toString
    src.write.mode("overwrite").partitionBy("yr").orc(out)
    val q = spark.read.orc(out).filter($"yr" === 1995)
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // partition pruning shows in the scan's partition filters
    assert(formatted.contains("PartitionFilters") && formatted.contains("yr"),
      formatted)
    assert(q.count() == src.filter($"yr" === 1995).count())
  }
}
