package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.streaming.{StreamingCuration, StreamingPacker}
import graft.streaming.StreamingPacker.Doc

/** The streaming ingest gate (quality → exact dedup → pack) must admit
  * exactly what the batch filters would, dedupe across micro-batches,
  * and hand the packer an uncorrupted running layout.
  */
class StreamingCurationSpec extends SparkSuite {
  import spark.implicits._

  private val good = (1L to 12L).map(i =>
    i -> s"the quick document number $i carries enough ordinary words to pass the quality gate today").toMap
  private val junk = "zzzz!!!! ####" // fails the stopword/quality score

  test("quality-rejects and cross-batch duplicates never reach the packed layout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingCuration.curatedPack(
      mem.toDS(), minScoreMicros = 500000L, numShards = 2, seqLen = 16)
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      // ids stay monotone across batches — the ingest contract the
      // packer's re-delivery high-water mark rides on
      mem.addData(Doc(1, good(1L)), Doc(2, good(2L)), Doc(4, junk))
      q.processAllAvailable()
      // batch 2: one fresh doc, one exact dup of doc 1's CONTENT under
      // a new id, one re-delivery of doc 2, one more junk
      mem.addData(Doc(5, good(5L)), Doc(6, good(1L)), Doc(2, good(2L)), Doc(7, junk))
      q.processAllAvailable()
      val packed = spark.table("curated").as[StreamingPacker.PackedDoc].collect()
      assert(packed.map(_.doc_id).sorted.toSeq == Seq(1L, 2L, 5L),
        s"only first-seen quality docs pack: ${packed.toSeq}")

      // the layout equals the batch packing of the admitted set
      val admitted = Seq(1L, 2L, 5L).map(i => (i, good(i)))
      val batch = {
        val df = admitted.toDF("doc_id", "text").select(
          (graft.functions.Md5Hash.lower63Col(col("doc_id").cast("string")) % 2)
            .cast("int").as("shard_id"),
          col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        df.as[(Int, Long, Long)].collect().groupBy(_._1).toSeq.flatMap {
          case (shard, rows) =>
            var acc = 0L
            rows.sortBy(_._2).map { case (_, id, n) =>
              val s = acc; acc += n; (id, shard, n, s / 16, s % 16)
            }
        }.toSet
      }
      assert(packed.map(p =>
        (p.doc_id, p.shard_id, p.n_tokens, p.seq_id, p.seq_offset)).toSet == batch)
    } finally q.stop()
  }
}
