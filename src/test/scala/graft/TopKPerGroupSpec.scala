package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

/** Native TopKPerGroup operator ≡ the window-function formulation, and
  * plans without a per-group sort.
  */
class TopKPerGroupSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("equals row_number window result (values + ranks)") {
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_returnflag", $"l_extendedprice")
    val native = TopKPerGroup(
      li, Seq("l_returnflag"),
      Seq(("l_extendedprice", true), ("l_orderkey", false)), k = 7)
      .select($"l_returnflag", $"l_orderkey", $"l_extendedprice", $"topk_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val w = Window.partitionBy($"l_returnflag")
      .orderBy(desc("l_extendedprice"), $"l_orderkey")
    val windowed = li.withColumn("topk_rank", row_number().over(w))
      .filter($"topk_rank" <= 7)
      .select($"l_returnflag", $"l_orderkey", $"l_extendedprice", $"topk_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(native == windowed)
    assert(native.nonEmpty)
  }

  test("plan: partial + final exec, exchange between, no Sort node") {
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_extendedprice", $"l_orderkey")
    val df = TopKPerGroup(
      li, Seq("l_returnflag"),
      Seq(("l_extendedprice", true), ("l_orderkey", false)), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
    df.count() // executes fine end-to-end
  }

  test("groups smaller than k rank 1..n") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("g", "v")
    val out = TopKPerGroup(df, Seq("g"), Seq(("v", true)), k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set(("a", 2, 1), ("a", 1, 2), ("b", 5, 1)))
  }
}
