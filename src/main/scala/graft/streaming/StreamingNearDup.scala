package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: MinHash + banded LSH over a
  * document STREAM — the stateful face of [[graft.operators.MinHashLsh]]
  * (same signature kernel, same banding), for pipelines that must
  * reject near-dups at ingest time instead of re-sweeping the corpus.
  *
  * Shape: signatures and band buckets compute MAP-SIDE on the stream
  * (the `MinHashSig` kernel + per-band xxhash64 — no shuffle); the only
  * stateful stage is `flatMapGroupsWithState` keyed by (band, bucket),
  * whose state holds the (id, signature) of docs previously routed to
  * that bucket. An arriving doc whose signature-estimated Jaccard
  * against any stored doc clears `threshold` emits a pair — including
  * pairs within one micro-batch (processed in doc_id order, so output
  * is deterministic per batch composition).
  *
  * Bounds: per-bucket state is capped at `maxPerBucket` docs (the
  * batch operator's hot-bucket cap, applied to state — an
  * all-boilerplate bucket stops growing instead of OOMing the state
  * store); production deployments add an event-time TTL via
  * `GroupStateTimeout` when the dedup horizon is finite. Output is
  * AT-LEAST-ONCE per pair: a true pair collides in ~`bands` buckets,
  * and a doc REJECTED by a full bucket is not remembered, so its
  * re-delivery can re-emit from that bucket — dedup downstream with
  * `dropDuplicates`/`dropDuplicatesWithinWatermark` on (id_a, id_b)
  * at the sink (re-delivered docs that DID fit in state are
  * remembered and emit nothing).
  */
object StreamingNearDup {

  final case class Doc(doc_id: Long, text: String)
  final case class DupPair(id_a: Long, id_b: Long, est_jaccard: Double)

  // public: Encoder-generated code lives outside this object and
  // cannot touch private members
  final case class BucketHit(
      band: Int, bucket: Long, doc_id: Long, sig: Array[Long])
  final case class BucketState(
      ids: Array[Long], sigs: Array[Array[Long]])

  private def matchFraction(a: Array[Long], b: Array[Long]): Double = {
    val n = math.min(a.length, b.length)
    var m = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) m += 1; i += 1 }
    if (n == 0) 0.0 else m.toDouble / n
  }

  /** Near-dup pairs (id_a < id_b, est ≥ threshold) of a streaming doc
    * frame against everything seen before it (and same-batch peers).
    */
  def pairs(
      docs: Dataset[Doc], shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.7,
      maxPerBucket: Int = 64): Dataset[DupPair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    import docs.sparkSession.implicits._
    val rows = numHashes / bands
    val banded = docs.toDF()
      .select(
        col("doc_id"),
        graft.functions.exprs.minhashSig(
          graft.functions.exprs.ngramHashes(col("text"), shingleN), numHashes)
          .as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"), posexplode(array(
        (0 until bands).map(b =>
          xxhash64(slice(col("sig"), b * rows + 1, rows), lit(b))): _*)))
      .select(
        col("pos").as("band"), col("col").as("bucket"),
        col("doc_id"), col("sig"))
      .as[BucketHit]

    banded
      .groupByKey(h => (h.band, h.bucket))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), hits: Iterator[BucketHit],
         state: GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(
            BucketState(Array.empty, Array.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[DupPair]
          hits.toSeq.sortBy(_.doc_id).foreach { h =>
            if (!st.ids.contains(h.doc_id)) {
              var i = 0
              while (i < st.ids.length) {
                val est = matchFraction(st.sigs(i), h.sig)
                if (est >= threshold) {
                  val (a, b) =
                    if (st.ids(i) < h.doc_id) (st.ids(i), h.doc_id)
                    else (h.doc_id, st.ids(i))
                  out += DupPair(a, b, est)
                }
                i += 1
              }
              if (st.ids.length < maxPerBucket)
                st = BucketState(st.ids :+ h.doc_id, st.sigs :+ h.sig)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
