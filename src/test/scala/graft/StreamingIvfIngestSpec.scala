package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, IvfStore}
import graft.streaming.StreamingIvfIngest

/** Streaming IVF ingest must leave the store identical to a batch
  * build over the same vectors, and re-delivered micro-batches must
  * be exact no-ops.
  */
class StreamingIvfIngestSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val cs = IvfIndex.trainCentroids(
    emb, "vec_id", "embedding", nlist = 16,
    sampleSize = 10000, iters = 5, seed = 42L)
    .map(_.toIndexedSeq).toIndexedSeq

  test("streamed appends == batch-built store; re-delivery is a no-op") {
    val streamed = java.nio.file.Files.createTempDirectory("ivf_stream").toString + "/idx"
    val batch = java.nio.file.Files.createTempDirectory("ivf_batch").toString + "/idx"
    IvfStore.build(emb.filter($"vec_id" < 100), "vec_id", "embedding", streamed, cs)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingIvfIngest.start(
      mem.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding", streamed)
    try {
      val rest = emb.filter($"vec_id" >= 100)
        .select($"vec_id", $"embedding")
        .as[(Long, Seq[Float])].collect()
      val (b1, b2) = rest.splitAt(rest.length / 2)
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val n0 = spark.read.parquet(s"$streamed/lists").count()
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable() // re-delivery
      assert(spark.read.parquet(s"$streamed/lists").count() == n0)
    } finally q.stop()

    IvfStore.build(emb, "vec_id", "embedding", batch, cs)
    val a = spark.read.parquet(s"$streamed/lists")
    val b = spark.read.parquet(s"$batch/lists")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed and batch-built lists diverged")
    val probes = emb.filter($"vec_id" < 5)
    val pa = IvfStore.probe(spark, streamed, probes, "vec_id", "embedding", 5, 8)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getInt(2)))
    val pb = IvfStore.probe(spark, batch, probes, "vec_id", "embedding", 5, 8)
      .collect().toSeq.sortBy(r => (r.getLong(0), r.getInt(2)))
    assert(pa == pb && pa.nonEmpty)
  }
}
