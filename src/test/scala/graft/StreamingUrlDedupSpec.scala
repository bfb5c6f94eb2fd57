package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingUrlDedup
import graft.streaming.StreamingUrlDedup.{Admitted, Page}

/** The streaming admission gate must equal batch keep-first dedup when
  * arrival order is id order (the frontier contract), collapse
  * variants WITHIN a micro-batch to the min id, and treat replays as
  * state no-ops.
  */
class StreamingUrlDedupSpec extends SparkSuite {
  import spark.implicits._

  test("variants collapse, first arrival wins, replay emits nothing") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Page]
    val q = StreamingUrlDedup.toMemorySink(
      StreamingUrlDedup.admitted(mem.toDS()), "admitted_urls")
    try {
      val b1 = Seq(
        Page(1L, "HTTP://A.COM:80/x?utm_src=1"), // variant of a.com/x
        Page(2L, "http://a.com/x"),              // same canon, same batch
        Page(5L, "http://b.com"))                // empty path -> '/'
      val b2 = Seq(
        Page(7L, "http://a.com/x#frag"),         // cross-batch duplicate
        Page(8L, "https://C.com:443/y?b=2&a=1"), // new: param sort + 443 strip
        Page(9L, "http://b.com/"))               // duplicate of 5's canon
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      def rows() = spark.table("admitted_urls").as[Admitted].collect().toSet
      val want = Set(
        Admitted("http://a.com/x", 1L),
        Admitted("http://b.com/", 5L),
        Admitted("https://c.com/y?a=1&b=2", 8L))
      assert(rows() == want, s"got ${rows()}")

      // streaming admissions == batch keep-first over all delivered pages
      val batch = (b1 ++ b2).toDF()
        .select(graft.functions.exprs.urlCanon(col("url")).as("canon_url"),
          col("page_id"))
        .groupBy("canon_url").agg(min("page_id").as("page_id"))
        .as[Admitted].collect().toSet
      assert(batch == want)

      // full replay: every page already rejected or admitted — no new rows
      mem.addData((b1 ++ b2): _*); q.processAllAvailable()
      assert(rows() == want, "replay must be a state no-op")
    } finally q.stop()
  }
}
