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

  test("asOfJoin backward: inclusive ties, null before first right row") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val left = Seq(
      (1L, 10L, t(5), 1.0),   // before any signup → null
      (2L, 10L, t(10), 2.0),  // equal ts → inclusive
      (3L, 10L, t(30), 3.0),  // after both → latest
      (4L, 99L, t(30), 4.0))  // user with no signups → null
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (100L, 10L, t(10)),
      (101L, 10L, t(20)))
      .toDF("signup_event_id", "user_id", "ts")
    val out = graft.operators.AsOfJoin
      .backward(left, right, "user_id", "ts", Seq("signup_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(100L), 3L -> Some(101L), 4L -> None))
  }

  test("rangeJoin: [start, end) boundaries, overlapping intervals, small buckets") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val pts = Seq((1L, t(0)), (2L, t(30)), (3L, t(60)), (4L, t(90)))
      .toDF("pid", "ts")
    val ivs = Seq((10L, t(0), t(60)), (11L, t(30), t(90)))
      .toDF("iid", "s", "e")
    // bucketSeconds smaller than interval length exercises multi-bucket explode
    val out = graft.operators.RangeJoin.pointInInterval(pts, ivs, "ts", "s", "e", 600)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)),
      s"got $out — start inclusive, end exclusive, overlaps included")
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

  test("saltedJoin rejects right/full outer (per-replica duplicate hazard)") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(df, df, "k", salt = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(df, df, "k", salt = 4, joinType = "full_outer")
    }
    // left-preserving types still pass through
    assert(SkewJoin.saltedJoin(df, df.withColumnRenamed("v", "w"), "k",
      salt = 4, joinType = "left_semi").count() == 1)
  }

  test("asOfJoin rejects payload names colliding with left columns") {
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val left = Seq((1L, 10L, ts, 1.0)).toDF("event_id", "user_id", "ts", "value")
    val right = Seq((10L, ts, 2.0)).toDF("user_id", "ts", "value")
    intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.backward(left, right, "user_id", "ts", Seq("value"))
    }
  }
}
