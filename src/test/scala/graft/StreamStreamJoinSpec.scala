package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.Event

/** Stream-stream view⋈purchase join: horizon bounds, strict-after,
  * cross-batch buffering, multiplicity (every qualifying pair emits).
  */
class StreamStreamJoinSpec extends SparkSuite {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(min: Long) = new Timestamp(t0.getTime + min * 60000)
  private def ev(id: Long, u: Long, atMin: Long, tpe: String) =
    Event(id, ts(atMin), u, tpe, 1.0)

  test("pairs within horizon only, across batches, all multiplicities") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val joined = EventsStreaming.viewPurchaseJoin(mem.toDF(), horizonMinutes = 60)
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      // batch 1: user 1 views at 0 and 10
      mem.addData(ev(1, 1L, 0, "view"), ev(2, 1L, 10, "view"))
      q.processAllAvailable()
      // batch 2: user 1 purchases at 30 (inside BOTH views' horizons,
      // which end at 60 and 70 — cross-batch buffering must emit two
      // pairs) and at 90 (outside both); user 2 purchases with no view
      mem.addData(ev(3, 1L, 30, "purchase"), ev(4, 1L, 90, "purchase"),
        ev(5, 2L, 30, "purchase"))
      q.processAllAvailable()
      val got = spark.table("ss_join")
        .select("user_id", "view_ts", "purchase_ts")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
        .toSet
      assert(got == Set(
        (1L, ts(0), ts(30)),
        (1L, ts(10), ts(30))), s"got $got")
    } finally q.stop()
  }
}
