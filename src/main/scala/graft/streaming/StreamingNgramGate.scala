package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextOps

/** Streaming face of the CCNet perplexity gate
  * ([[graft.operators.NgramLm]]): a bigram model trained ONCE on a
  * clean reference slice scores a document STREAM at ingest, so
  * high-perplexity pages die at the door instead of in a nightly
  * sweep.
  *
  * The model is a bounded artifact (vocabulary-grain counts — the
  * broadcast-threshold pattern every streaming gate here uses), so it
  * ships to executors in the scoring closure; scoring is STATELESS
  * per-document (a typed map, no shuffle, no state store), which makes
  * replay trivially idempotent — re-delivered docs re-emit identical
  * rows, and any exactly-once sink dedups on doc_id. Costs are the
  * batch operator's integer bit-lengths evaluated in the same order,
  * and the mean is the same single fixed-order division, so streaming
  * scores are BIT-IDENTICAL to [[graft.operators.NgramLm.bigramBits]]
  * (StreamingNgramGateSpec asserts exact equality, doubles included).
  */
object StreamingNgramGate {

  final case class Doc(doc_id: Long, text: String)
  final case class Scored(
      doc_id: Long, n_bigrams: Long, n_unseen: Long,
      total_bits: Long, mean_bits: Double, keep: Boolean)

  /** Reference bigram counts: c12 keyed "w1 w2", c1 keyed w1, n = total
    * reference bigrams. Built by [[trainModel]]; bounded by the
    * reference vocabulary.
    */
  final case class BigramModel(
      c12: Map[String, Long], c1: Map[String, Long], n: Long)

  /** Train on the `isTrain` slice of a batch frame — two keyed
    * aggregations, collected as the bounded model artifact.
    */
  def trainModel(
      docs: DataFrame, idCol: String, textCol: String,
      isTrain: Column): BigramModel = {
    val big = docs
      .filter(isTrain)
      .select(TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), j -> " +
          "named_struct('w1', toks[j-1], 'w2', toks[j]))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .collect().map(r =>
        (r.getString(0) + " " + r.getString(1)) -> r.getLong(2)).toMap
    val c1 = c12.groupBy(_._1.split(' ')(0)).map { case (w, m) => w -> m.values.sum }
    BigramModel(c12, c1, c12.values.sum)
  }

  @inline private def bitlen(x: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(x) // x >= 1

  /** Tokenize exactly like [[TextOps.tokens]] (Spark `lower` +
    * `[\t\n\f\r ]` split — UTF8String.toLowerCase IS Spark's lower).
    */
  private def tokenize(text: String): Array[String] = {
    val s = UTF8String.fromString(if (text == null) "" else text)
      .toLowerCase.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && graft.functions.NgramHashes.isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !graft.functions.NgramHashes.isWs(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** Score a doc stream against the fixed model; keep = mean bits per
    * transition under `maxMeanBits` (docs with no bigrams keep=false,
    * matching the batch query's gate).
    */
  def score(
      docs: Dataset[Doc], model: BigramModel,
      maxMeanBits: Double): Dataset[Scored] = {
    import docs.sparkSession.implicits._
    val nBits = bitlen(math.max(model.n, 1L))
    docs.map { d =>
      val t = tokenize(d.text)
      var total = 0L
      var unseen = 0L
      var i = 0
      while (i + 1 < t.length) {
        model.c12.get(t(i) + " " + t(i + 1)) match {
          case Some(cc) => total += bitlen(model.c1(t(i))) - bitlen(cc)
          case None => total += nBits; unseen += 1
        }
        i += 1
      }
      val nb = math.max(t.length - 1, 0).toLong
      val mean = if (nb == 0) 0.0 else total.toDouble / nb.toDouble
      Scored(d.doc_id, nb, unseen, total, mean, nb > 0 && mean < maxMeanBits)
    }
  }

  /** Convenience writer for tests: run to a memory sink in Append mode. */
  def toMemorySink(ds: Dataset[Scored], name: String): org.apache.spark.sql.streaming.StreamingQuery =
    ds.writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
}
