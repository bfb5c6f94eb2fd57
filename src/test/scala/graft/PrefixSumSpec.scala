package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** Distributed exclusive prefix sum: must equal the window cumsum
  * exactly, be invariant to input partitioning, and reject non-long
  * value columns.
  */
class PrefixSumSpec extends SparkSuite {
  import spark.implicits._

  private def df = (1L to 5000L).map(i => (i, (i * 7) % 13)).toDF("k", "v")
    .select(col("k"), col("v").cast("long").as("v"))

  test("equals SUM OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) minus current") {
    val got = PrefixSum.withExclusivePrefix(df, Seq(col("k")), "v", "pre")
      .orderBy("k").select("k", "pre").as[(Long, Long)].collect()
    val exp = df.withColumn("pre",
      coalesce(sum("v").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("k").select("k", "pre").as[(Long, Long)].collect()
    assert(got.sameElements(exp))
  }

  test("partition-layout invariant") {
    val a = PrefixSum.withExclusivePrefix(df, Seq(col("k")), "v", "pre")
      .orderBy("k").select("k", "pre").as[(Long, Long)].collect()
    val b = PrefixSum.withExclusivePrefix(df.repartition(17), Seq(col("k")), "v", "pre")
      .orderBy("k").select("k", "pre").as[(Long, Long)].collect()
    assert(a.sameElements(b))
  }

  test("rejects non-long value columns instead of silently truncating") {
    val bad = df.withColumn("v", col("v").cast("int"))
    intercept[IllegalArgumentException] {
      PrefixSum.withExclusivePrefix(bad, Seq(col("k")), "v", "pre")
    }
  }

  test("result is provably independent of the bucket count") {
    def run(buckets: Int) =
      PrefixSum.withExclusivePrefix(df, Seq(col("k")), "v", "pre", buckets)
        .orderBy("k").select("k", "pre").as[(Long, Long)].collect().toSeq
    val base = run(0) // auto
    for (b <- Seq(1, 2, 7, 64, 10000)) {
      assert(run(b) == base, s"numBuckets=$b must not change the answer")
    }
  }

  test("SearchSortedCount ≡ the filter-HOF count, atomic and struct keys") {
    // The bucket assignment kernel must agree with the declarative
    // size(filter(arr, p -> p <= k)) it replaced — including keys
    // below, inside, above, and equal to pivot values.
    val probes = df.select(
      col("k"),
      struct((col("k") % 17).as("a"), col("k").as("b")).as("ks"),
      sort_array(sequence(lit(3L), lit(4800L), lit(7L))).as("arr"),
      sort_array(array((1L to 40L).map(i =>
        struct(lit(i % 17).as("a"), lit(i * 100).as("b"))): _*)).as("sarr"))
    val rows = probes.select(
      graft.functions.exprs.searchSortedCount(col("arr"), col("k")).as("bs"),
      size(filter(col("arr"), p => p <= col("k"))).as("hof"),
      graft.functions.exprs.searchSortedCount(col("sarr"), col("ks")).as("sbs"),
      size(filter(col("sarr"), p => p <= col("ks"))).as("shof"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "atomic key")
      assert(r.getInt(2) == r.getInt(3), "struct key")
    }
  }
}
