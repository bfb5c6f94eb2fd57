package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingQuantile

/** Streaming histogram quantiles must equal the batch histogram of
  * the union across partitioned micro-batches, and must agree with
  * the batch query's crossing convention (bin upper bound, integer-
  * fraction targets).
  */
class StreamingQuantileSpec extends SparkSuite {
  import spark.implicits._

  private val W = 100L

  private def batchQuantiles(rows: Seq[(String, Long)]): Set[(String, Long, Long, Long, Long)] =
    rows.groupBy(_._1).map { case (scope, rs) =>
      val bins = rs.groupBy(r => Math.floorDiv(r._2, W))
        .map { case (b, g) => b -> g.size.toLong }
      val n = rs.size.toLong
      (scope, n,
        StreamingQuantile.quantileOf(bins, n, 1, 2, W),
        StreamingQuantile.quantileOf(bins, n, 9, 10, W),
        StreamingQuantile.quantileOf(bins, n, 99, 100, W))
    }.toSet

  test("streaming quantiles equal the batch histogram of the union") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val ds = StreamingQuantile.estimates(
      mem.toDS().toDF("scope", "v"), "scope", "v", binWidth = W)
    val q = StreamingQuantile.toMemorySink(ds, "quants")
    try {
      // two PARTITIONED batches (exactly-once contract)
      val b1 = (1L to 500L).map(v => ("api", v * 3)) ++
        (1L to 40L).map(v => ("job", v * 97))
      val b2 = (501L to 900L).map(v => ("api", v * 3)) ++
        (41L to 60L).map(v => ("job", v * 97))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      def rows() = spark.table("quants")
        .as[StreamingQuantile.ScopeQuantiles].collect()
        .map(r => (r.scope, r.n, r.p50, r.p90, r.p99)).toSet
      val want = batchQuantiles(b1) ++ batchQuantiles(b1 ++ b2)
      assert(rows() == want, s"got ${rows()}")
    } finally q.stop()
  }

  test("crossing convention matches the batch query: monotone, upper-bound-valued") {
    val vals = (1L to 1000L).map(v => ("s", v))
    val Seq((_, n, p50, p90, p99)) = batchQuantiles(vals).toSeq
    assert(n == 1000L)
    // true p50 = 500 → bin 5 → upper bound 599; p90 = 900 → 999; p99 = 990 → 999
    assert(p50 == 599L && p90 == 999L && p99 == 999L)
    assert(p50 <= p90 && p90 <= p99)
  }
}
