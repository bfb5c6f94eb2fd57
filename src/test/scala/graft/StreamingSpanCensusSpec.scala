package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SpanDedup
import graft.streaming.StreamingSpanCensus

/** Streaming span-census maintenance: the stream-folded census must
  * EQUAL the one-shot census over every delivered document (counts
  * over disjoint doc sets are additive — batch-composition-
  * independent), re-delivery must be a no-op, and an excision served
  * from the streamed census must equal the full-rebuild answer.
  */
class StreamingSpanCensusSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stream-folded census equals one-shot; replay no-op; serving matches rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val all = docs.as[(Long, String)].collect()
    val folder = new StreamingSpanCensus(n = 8)

    val mem = MemoryStream[(Long, String)]
    val q = folder.writer(mem.toDF().toDF("doc_id", "text")).start()
    try {
      val (b1, rest) = all.splitAt(all.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = folder.census.get
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val oneShot = SpanDedup.spanCensus(docs, "doc_id", "text", n = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == oneShot,
        "stream fold must equal the one-shot census over the union")

      mem.addData(b2.toIndexedSeq) // at-least-once re-delivery
      q.processAllAvailable()
      val replayed = folder.census.get
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(replayed == streamed, "re-delivered docs must be a no-op")

      // serving: clean the perturbed twins against the streamed census —
      // must equal the full-rebuild excision restricted to the twins
      val twins = docs.select(
        (col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^[^\\t\\n\\f\\r ]+[\\t\\n\\f\\r ]*", "")
          .as("text"))
      val served = folder.excise(twins, maxDocs = 1L)
        .orderBy("doc_id").collect().toSeq
      val rebuilt = SpanDedup.exciseCommonSpans(
          docs.unionByName(twins), "doc_id", "text", n = 8, maxDocs = 1L)
        .filter(col("doc_id") >= 100000L)
        .orderBy("doc_id").collect().toSeq
      assert(served == rebuilt,
        "excision served from the streamed census must equal the rebuild")
    } finally q.stop()
  }
}
