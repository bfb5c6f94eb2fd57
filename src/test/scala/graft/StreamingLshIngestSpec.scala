package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.LshIndex
import graft.streaming.StreamingLshIngest

/** Streaming LSH ingest must leave the index IDENTICAL to a batch
  * build over the same documents, and a re-delivered micro-batch
  * must be an exact no-op (the index IS the state).
  */
class StreamingLshIngestSpec extends SparkSuite {
  import spark.implicits._

  private def words(seed: Long, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * i * 7) % 211}").mkString(" ")

  private def corpus = (0L until 40L)
    .map(i => (i, words(i, 60)))
    .toDF("doc_id", "text")

  test("streamed appends == batch-built index; re-delivery is a no-op") {
    val streamedPath = Files.createTempDirectory("lsh_stream").toString + "/idx"
    val batchPath = Files.createTempDirectory("lsh_batch").toString + "/idx"

    // offline build over the first slice; the stream delivers the rest
    LshIndex.build(corpus.filter($"doc_id" < 10), "doc_id", "text", streamedPath,
      family = graft.operators.MinHashLsh.Family.Md5Mod(7L))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingLshIngest.start(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text", streamedPath)
    try {
      val rest = corpus.filter($"doc_id" >= 10).as[(Long, String)].collect()
      val (b1, b2) = rest.splitAt(rest.length / 2)
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val n0 = spark.read.parquet(s"$streamedPath/sigs").count()
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable() // re-delivery
      assert(spark.read.parquet(s"$streamedPath/sigs").count() == n0,
        "re-delivered micro-batch must be a no-op")
    } finally q.stop()

    LshIndex.build(corpus, "doc_id", "text", batchPath,
      family = graft.operators.MinHashLsh.Family.Md5Mod(7L))
    Seq("sigs", "buckets").foreach { d =>
      val a = spark.read.parquet(s"$streamedPath/$d")
      val b = spark.read.parquet(s"$batchPath/$d")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$d diverged between streamed and batch-built index")
    }
    // and the served results agree
    val probe = corpus.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 1000)
    val pa = LshIndex.probe(spark, streamedPath, probe, "doc_id", "text", 0.5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    val pb = LshIndex.probe(spark, batchPath, probe, "doc_id", "text", 0.5)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(pa == pb && pa.nonEmpty)
  }
}
