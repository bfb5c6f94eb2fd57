package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.KnnGraph
import graft.streaming.StreamingKnnAppend

/** Streaming kNN-graph maintenance: the stream-built graph must EQUAL
  * the one-shot build over the union of all delivered vectors (the
  * append merge identity, batch-composition-independent), and
  * re-delivered ids must be a no-op (at-least-once → effectively-once).
  */
class StreamingKnnAppendSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stream-folded graph equals one-shot build; re-delivery is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val all = emb.as[(Long, Array[Float])].collect()
    // fixed quantizer — the production index-artifact contract
    val cs = graft.operators.IvfIndex.seededCentroids(
      dim = 64, nlist = 16, seed = 11L)
    val folder = new StreamingKnnAppend(cs, nprobe = 8, k = 5)

    val mem = MemoryStream[(Long, Array[Float])]
    val q = folder.writer(
      mem.toDF().toDF("vec_id", "embedding")).start()
    try {
      // three uneven batches, then a full replay of the middle one
      val (b1, rest) = all.splitAt(all.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = folder.graph.get
        .select("query_id", "neighbor_id", "rank").collect().toSet
      val oneShot = KnnGraph.buildWithCentroids(
        emb, "vec_id", "embedding", k = 5, cs, nprobe = 8)
        .select("query_id", "neighbor_id", "rank").collect().toSet
      assert(streamed == oneShot,
        "stream fold must equal the one-shot build over the union")

      mem.addData(b2.toIndexedSeq) // at-least-once re-delivery
      q.processAllAvailable()
      val replayed = folder.graph.get
        .select("query_id", "neighbor_id", "rank").collect().toSet
      assert(replayed == streamed, "re-delivered ids must be a no-op")
      assert(folder.corpus.get.count() == all.length.toLong)
    } finally q.stop()
  }
}
