package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventsStreaming.Event
import graft.streaming.StreamingFunnel

/** Stateful streaming funnel: cross-batch conversion, strict-after
  * ties, single emission, batch-internal reordering.
  */
class StreamingFunnelSpec extends SparkSuite {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(s: Long) = new Timestamp(t0.getTime + s * 1000)
  private def ev(id: Long, u: Long, at: Long, tpe: String) =
    Event(id, ts(at), u, tpe, 1.0)

  test("funnel converts across batches, once, with strict-after ties") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingFunnel.conversions(mem.toDS(), "view", "purchase")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 views; user 2 purchases with no view; user 3's
      // purchase lands in the same batch AT its view's instant (tie —
      // strict-after says no conversion)
      mem.addData(
        ev(1, 1L, 10, "view"), ev(2, 2L, 10, "purchase"),
        ev(3, 3L, 10, "view"), ev(4, 3L, 10, "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnel_out").count() == 0)
      // batch 2: user 1 converts (cross-batch); user 4 view+purchase
      // delivered purchase-first in one batch — ts sort must fix it
      mem.addData(
        ev(5, 1L, 50, "purchase"),
        ev(6, 4L, 30, "purchase"), ev(7, 4L, 20, "view"))
      q.processAllAvailable()
      val rows = spark.table("funnel_out")
        .select("user_id", "us_to_convert").as[(Long, Long)].collect().toMap
      assert(rows == Map(1L -> 40000000L, 4L -> 10000000L), s"got $rows")
      // batch 3: another purchase for user 1 — already converted, no
      // re-emission; a first purchase for user 2 whose view never came
      mem.addData(ev(8, 1L, 99, "purchase"), ev(9, 2L, 99, "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnel_out").count() == 2, "conversion must emit exactly once")
    } finally q.stop()
  }
}
