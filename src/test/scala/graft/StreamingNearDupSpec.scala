package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.Doc

/** Streaming MinHash near-dup: cross-batch + same-batch detection. */
class StreamingNearDupSpec extends SparkSuite {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the band plays " +
      "a long familiar tune about distant hills and quiet rivers flowing home"
  private val variant = base.replace("quick", "swift") // near-dup of base
  private val other =
    "completely different content entirely unrelated to anything above " +
      "statistics physics chemistry biology geology astronomy meteorology oceans"

  test("near-dups detected across and within micro-batches; distinct docs are not") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingNearDup.pairs(mem.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_pairs")
      .outputMode("append").start()
    try {
      // batch 1: base doc + an unrelated doc — no pairs
      mem.addData(Doc(1, base), Doc(3, other))
      q.processAllAvailable()
      assert(spark.table("neardup_pairs").count() == 0)
      // batch 2: a near-copy of doc 1 (cross-batch pair) and a copy of
      // doc 3 (same-batch pair with doc 30, delivered together)
      mem.addData(Doc(2, variant), Doc(30, other + " extra"), Doc(31, other + " extra"))
      q.processAllAvailable()
      val pairs = spark.table("neardup_pairs")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"cross-batch near-dup missed: $pairs")
      assert(pairs.contains((30L, 31L)), s"same-batch exact dup missed: $pairs")
      assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
        s"distinct docs must not pair: $pairs")
      // re-delivery of an already-seen doc id adds no state and no pairs
      val before = spark.table("neardup_pairs").count()
      mem.addData(Doc(2, variant))
      q.processAllAvailable()
      assert(spark.table("neardup_pairs").count() == before,
        "re-delivered doc_id must not re-emit")
    } finally q.stop()
  }
}
