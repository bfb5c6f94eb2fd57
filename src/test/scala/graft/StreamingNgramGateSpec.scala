package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.NgramLm
import graft.streaming.StreamingNgramGate
import graft.streaming.StreamingNgramGate.{Doc, Scored}

/** The streaming perplexity gate must score BIT-IDENTICALLY to the
  * batch operator (integer bits, same fixed-order mean division) and
  * be replay-idempotent (stateless map — re-delivery re-emits the
  * identical rows).
  */
class StreamingNgramGateSpec extends SparkSuite {
  import spark.implicits._

  test("streaming scores == batch NgramLm.bigramBits, doubles included") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .filter(col("doc_id") < 100)
    val isTrain = col("doc_id") % 5 === 0
    val model = StreamingNgramGate.trainModel(corpus, "doc_id", "text", isTrain)
    val held = corpus.filter(!isTrain).as[Doc].collect()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingNgramGate.toMemorySink(
      StreamingNgramGate.score(mem.toDS(), model, maxMeanBits = 5.0), "ngram_gate")
    try {
      val (b1, b2) = held.splitAt(held.length / 2)
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()

      val streamed = spark.table("ngram_gate").as[Scored].collect()
        .map(s => s.doc_id -> s).toMap
      val batch = NgramLm.bigramBits(corpus, "doc_id", "text", isTrain)
        .withColumn("keep",
          when(col("n_bigrams") === 0, lit(false))
            .otherwise(col("mean_bits") < 5.0))
        .collect()
      assert(batch.nonEmpty && batch.length == streamed.size)
      batch.foreach { r =>
        val s = streamed(r.getAs[Long]("doc_id"))
        assert(s.n_bigrams == r.getAs[Long]("n_bigrams"), s"doc ${s.doc_id}")
        assert(s.n_unseen == r.getAs[Long]("n_unseen"), s"doc ${s.doc_id}")
        assert(s.total_bits == r.getAs[Long]("total_bits"), s"doc ${s.doc_id}")
        assert(s.mean_bits == r.getAs[Double]("mean_bits"), s"doc ${s.doc_id}")
        assert(s.keep == r.getAs[Boolean]("keep"), s"doc ${s.doc_id}")
      }

      // replay: stateless scoring re-emits identical rows (at-least-once
      // contract; sinks dedup on doc_id)
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      val again = spark.table("ngram_gate").as[Scored].collect()
        .groupBy(_.doc_id).view.mapValues(_.distinct.length).toMap
      assert(again.values.forall(_ == 1), "replay rows must be identical")
    } finally q.stop()
  }
}
