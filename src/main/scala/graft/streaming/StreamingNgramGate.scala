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
    * reference bigrams. Built by [[trainModel]]; HARD-BOUNDED at
    * `topK` bigram entries regardless of corpus size.
    */
  final case class BigramModel(
      c12: Map[String, Long], c1: Map[String, Long], n: Long)

  /** Default model cap: 2^20 bigram entries (~100-200 MB as a JVM map)
    * — comfortably executor-broadcast-sized, and far above the bigram
    * vocabulary of any clean REFERENCE slice a CCNet-style gate trains
    * on (the reference slice is curated and small by design; it is the
    * SCORED stream that is 100 TB).
    */
  val DefaultTopK: Int = 1 << 20

  /** Train on the `isTrain` slice of a batch frame. All aggregation is
    * cluster-side; the only driver materialization is the CAPPED model
    * artifact — top-`topK` bigrams by count (ties broken by (w1, w2),
    * deterministic), the LineDedup broadcast-blacklist cap recipe.
    * Bigram *types* grow ~linearly with training-corpus size (Heaps'
    * law), so an uncapped collect is not driver-sized at scale; the cap
    * makes the artifact O(topK) no matter the corpus.
    *
    * Bit-exactness under the cap: `n` and the prefix masses `c1` are
    * computed over the FULL bigram table BEFORE capping, so every
    * bigram that survives the cap scores exactly as it would uncapped;
    * a dropped bigram scores as unseen (the model's own semantics for
    * below-resolution transitions). When the training slice has at most
    * `topK` bigram types — every fixture here — the cap is a no-op and
    * scores are bit-identical to the uncapped model.
    */
  def trainModel(
      docs: DataFrame, idCol: String, textCol: String,
      isTrain: Column, topK: Int = DefaultTopK): BigramModel = {
    val big = docs
      .filter(isTrain)
      .select(TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), j -> " +
          "named_struct('w1', toks[j-1], 'w2', toks[j]))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    // exploded frame feeds total, prefix masses, and the capped head —
    // truncate lineage once (the measured broadcast-blacklist rule)
    val c12Frame = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val n = c12Frame.agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0)
    val capped = c12Frame
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(topK)
    val c1Frame = c12Frame.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
      .join(capped.select(col("w1")).distinct(), Seq("w1"), "semi")
    val c12 = capped.collect().map(r =>
      (r.getString(0) + " " + r.getString(1)) -> r.getLong(2)).toMap
    val c1 = c1Frame.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    BigramModel(c12, c1, n)
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
