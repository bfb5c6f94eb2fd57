package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{PrefixSum, TextOps}
import graft.streaming.StreamingPacker
import graft.streaming.StreamingPacker.Doc

/** Streaming per-shard sequence packing must equal the batch PrefixSum
  * packing of each shard's docs in id order, survive micro-batch
  * boundaries, and treat re-delivered ids as no-ops.
  */
class StreamingPackerSpec extends SparkSuite {
  import spark.implicits._

  private val texts = (1L to 40L).map(i =>
    i -> (s"doc $i " + ("tok " * (i % 7 + 1).toInt).trim)).toMap
  private def docs(ids: Seq[Long]) = ids.map(i => Doc(i, texts(i)))

  /** Batch oracle: per-shard exclusive cumsum over doc_id order via the
    * SAME shard hash + tokenizer, cumsum by PrefixSum per shard.
    */
  private def expected(ids: Seq[Long], numShards: Int, seqLen: Long) = {
    val df = ids.map(i => (i, texts(i))).toDF("doc_id", "text")
      .select(
        (graft.functions.Md5Hash.lower63Col(col("doc_id").cast("string")) % numShards)
          .cast("int").as("shard_id"),
        col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    df.as[(Int, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (shard, rows) =>
        var acc = 0L
        rows.sortBy(_._2).map { case (_, id, n) =>
          val start = acc; acc += n
          (id, shard, n, start / seqLen, start % seqLen)
        }
      }.toSet
  }

  test("streaming layout equals batch per-shard PrefixSum packing across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingPacker.pack(mem.toDS(), numShards = 4, seqLen = 8)
      .writeStream.format("memory").queryName("packed")
      .outputMode("append").start()
    try {
      mem.addData(docs(1L to 20L): _*)
      q.processAllAvailable()
      mem.addData(docs(21L to 40L): _*)
      q.processAllAvailable()
      val got = spark.table("packed")
        .as[StreamingPacker.PackedDoc].collect()
        .map(p => (p.doc_id, p.shard_id, p.n_tokens, p.seq_id, p.seq_offset)).toSet
      assert(got == expected(1L to 40L, numShards = 4, seqLen = 8),
        "two-batch stream must equal the batch packing")

      // re-delivery of the whole first batch: no new rows, state intact
      val before = spark.table("packed").count()
      mem.addData(docs(1L to 20L): _*)
      q.processAllAvailable()
      assert(spark.table("packed").count() == before, "replayed prefix must no-op")

      // a fresh doc continues from the pre-replay running totals
      val extraText = "alpha beta gamma delta"
      mem.addData(Doc(41L, extraText))
      q.processAllAvailable()
      val all = (1L to 40L).map(i => (i, texts(i))) :+ (41L -> extraText)
      val expAll = {
        val df = all.toDF("doc_id", "text").select(
          (graft.functions.Md5Hash.lower63Col(col("doc_id").cast("string")) % 4)
            .cast("int").as("shard_id"),
          col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        PrefixSum.withExclusivePrefix(
          df.filter(col("shard_id") === (
            df.filter(col("doc_id") === 41L).select("shard_id").as[Int].head())),
          Seq(col("doc_id")), "n_tokens", "start")
          .filter(col("doc_id") === 41L)
          .select(col("start")).as[Long].head()
      }
      val got41 = spark.table("packed").as[StreamingPacker.PackedDoc]
        .collect().find(_.doc_id == 41L).get
      assert(got41.seq_id == expAll / 8 && got41.seq_offset == expAll % 8,
        "post-replay doc must continue the uncorrupted running total")
    } finally q.stop()
  }
}
