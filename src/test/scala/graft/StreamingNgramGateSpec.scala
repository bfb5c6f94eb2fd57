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

  test("model cap is hard-bounded; survivors score exactly as uncapped") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .filter(col("doc_id") < 100)
    val isTrain = col("doc_id") % 5 === 0
    val full = StreamingNgramGate.trainModel(corpus, "doc_id", "text", isTrain)
    val k = 10
    val capped = StreamingNgramGate.trainModel(corpus, "doc_id", "text", isTrain, topK = k)

    assert(full.c12.size > k, "fixture must exceed the tiny cap for this test")
    assert(capped.c12.size == k, s"cap must bind exactly: ${capped.c12.size}")
    // n and prefix masses come from the FULL table — surviving bigrams
    // cost exactly what they cost uncapped
    assert(capped.n == full.n)
    capped.c12.foreach { case (key, c) => assert(full.c12(key) == c, key) }
    capped.c1.foreach { case (w1, c) => assert(full.c1(w1) == c, w1) }
    // the cap keeps the TOP-K by count: every kept count >= every dropped
    val keptMin = capped.c12.values.min
    val dropped = full.c12.filter { case (key, _) => !capped.c12.contains(key) }
    assert(dropped.values.forall(_ <= keptMin))

    // default cap is a no-op on the fixture: models identical
    assert(full.c12.size < StreamingNgramGate.DefaultTopK)
    val dflt = StreamingNgramGate.trainModel(corpus, "doc_id", "text", isTrain)
    assert(dflt.c12 == full.c12 && dflt.c1 == full.c1 && dflt.n == full.n)
  }

  test("scoring path has no driver materialization (no collect)") {
    // the model is the only artifact that crosses to the driver, and it
    // is O(topK)-bounded by trainModel; score() itself must stay a
    // stateless cluster-side map — assert at the source level
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/streaming/StreamingNgramGate.scala")), "UTF-8")
    val scoreBody = src.substring(src.indexOf("def score("), src.indexOf("def toMemorySink"))
    assert(!scoreBody.contains(".collect"), "score() must not collect")
    assert(!scoreBody.contains(".head"), "score() must not pull rows to the driver")
  }
}
