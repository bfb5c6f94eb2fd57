package graft

import org.apache.spark.sql.functions._

import graft.functions.Money
import graft.operators.SkewJoin

/** Scale-mechanics guarantees: partition-invariant exact aggregation
  * and salted-join equivalence.
  */
class ScaleOpsSpec extends SparkSuite {
  import spark.implicits._

  test("decSum: identical result under any partitioning (exactness)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    def total(parts: Int): Double =
      li.repartition(parts)
        .agg(Money.decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
        .collect()(0).getDouble(0)
    val r = Seq(1, 3, 7, 32).map(total)
    assert(r.distinct.size == 1, s"partitioning changed the sum: $r")
    // plain double sums do NOT have this property — that asymmetry is
    // exactly why Money.decSum exists (oracle hash parity)
  }

  test("saltedJoin ≡ plain join") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_quantity")
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    val plain = li.join(orders, Seq("l_orderkey")).groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), Money.decSum($"l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewJoin.saltedJoin(li, orders, "l_orderkey", salt = 8)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), Money.decSum($"l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(plain == salted)
  }
}
