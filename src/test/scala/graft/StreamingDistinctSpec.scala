package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.functions.{KmvSketch, Md5Hash}
import graft.streaming.StreamingDistinct

/** Streaming KMV cardinality must equal the batch sketch of the union
  * across micro-batches, and replayed data must be a state no-op
  * (KMV reduce is idempotent and order-insensitive).
  */
class StreamingDistinctSpec extends SparkSuite {
  import spark.implicits._

  private val K = 32

  private def batchEstimate(rows: Seq[(String, Long)]): Map[String, (Long, Long, Long)] = {
    val agg = new KmvSketch(K)
    rows.groupBy(_._1).map { case (scope, rs) =>
      var b = agg.zero
      rs.foreach { case (_, u) => b = agg.reduce(b, Md5Hash.lower63(u.toString)) }
      val kept = agg.finish(b)
      val est =
        if (kept.size < K) kept.size.toLong
        else 9187343239835811840L / math.max(kept.last >> 8, 1L)
      scope -> ((kept.size.toLong, kept.last, est))
    }
  }

  private def asRows(m: Map[String, (Long, Long, Long)]): Set[(String, Long, Long, Long)] =
    m.map { case (s, (k, h, e)) => (s, k, h, e) }.toSet

  test("streaming estimates equal the batch sketch of the union; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val ds = StreamingDistinct.estimates(
      mem.toDS().toDF("scope", "user"), "scope", "user", k = K)
    val q = StreamingDistinct.toMemorySink(ds, "cards")
    try {
      val b1 = (1L to 60L).map(u => ("click", u)) ++ (1L to 10L).map(u => ("buy", u))
      val b2 = (41L to 120L).map(u => ("click", u)) ++ (5L to 20L).map(u => ("buy", u))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // Update-mode sink accumulates one emission per (scope, batch);
      // the DISTINCT row set is exactly {state after b1, state after
      // b1+b2} per scope — order-independent and fully deterministic.
      def distinctRows() = spark.table("cards")
        .as[StreamingDistinct.ScopeCard].collect()
        .map(c => (c.scope, c.k_seen, c.kth_hash, c.est_distinct)).toSet
      val want12 = asRows(batchEstimate(b1)) ++ asRows(batchEstimate(b1 ++ b2))
      assert(distinctRows() == want12, s"got ${distinctRows()}")
      // click saturates K=32 (120 distinct), buy stays exact (20 < K)
      val fin = batchEstimate(b1 ++ b2)
      assert(fin("click")._1 == K.toLong && fin("buy") == ((20L, fin("buy")._2, 20L)))

      // full replay of batch 1: emits the unchanged state — no NEW
      // distinct row may appear
      mem.addData(b1: _*); q.processAllAvailable()
      assert(distinctRows() == want12, "replay must be a state no-op")
    } finally q.stop()
  }
}
