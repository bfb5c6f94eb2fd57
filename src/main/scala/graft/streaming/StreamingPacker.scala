package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Md5Hash
import graft.operators.TextOps

/** Streaming sequence packing: the stateful face of
  * [[graft.operators.PrefixSum]]'s concat-and-chunk layout (the
  * `sequence_packing` query), for pipelines that assign training-
  * sequence positions at INGEST time instead of re-scanning the corpus.
  *
  * Batch packing is a global cumsum over doc order — a stream cannot
  * revisit the past, so the streaming layout shards the corpus first
  * (shard = md5-lower63(doc_id) mod S, the same webdataset-style split
  * `shard_manifest` uses) and packs each shard independently: ONE
  * state row per shard holding (highest doc_id seen, running token
  * total). Token counting is map-side (`TextOps.tokenCount`, the
  * kernel the batch query uses — byte-identical counts); the only
  * stateful stage is `flatMapGroupsWithState` keyed by shard.
  *
  * Within a micro-batch each shard processes docs in doc_id order, so
  * output is deterministic given batch composition; and because real
  * ingest ids are monotone, the operator REQUIRES per-shard monotone
  * progress: a doc whose id is ≤ the shard's high-water mark is a
  * re-delivery and emits nothing (exact replay of a prefix or a whole
  * batch is a no-op — the idempotence contract `Star.append` and the
  * LSH index follow). Per-shard offsets equal the batch PrefixSum
  * packing of that shard's docs in id order — StreamingPackerSpec
  * asserts the ≡ against `PrefixSum.withExclusivePrefix`.
  *
  * State: S rows of two longs, constant in corpus size. At 100 TB the
  * same plan runs with shard-count state on a real cluster; the
  * shuffle carries (shard, id, n_tokens) — never text.
  */
object StreamingPacker {

  final case class Doc(doc_id: Long, text: String)
  // public: Encoder-generated code lives outside this object
  final case class Tokenized(shard_id: Int, doc_id: Long, n_tokens: Long)
  final case class PackedDoc(
      doc_id: Long, shard_id: Int, n_tokens: Long, seq_id: Long, seq_offset: Long)
  final case class ShardState(maxDocId: Long, runningToks: Long)

  /** Assign (seq_id, seq_offset) per doc within its shard's packed
    * layout; `seqLen` is the fixed training-sequence length.
    */
  def pack(
      docs: Dataset[Doc], numShards: Int = 16,
      seqLen: Long = 2048L): Dataset[PackedDoc] = {
    require(numShards > 0 && seqLen > 0, "numShards and seqLen must be positive")
    import docs.sparkSession.implicits._
    val tokenized = docs.select(
      (Md5Hash.lower63Col(col("doc_id").cast("string")) % numShards)
        .cast("int").as("shard_id"),
      col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens")).as[Tokenized]
    tokenized
      .groupByKey(_.shard_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[Tokenized], state: GroupState[ShardState]) =>
          val prev = state.getOption.getOrElse(ShardState(Long.MinValue, 0L))
          var maxId = prev.maxDocId
          var acc = prev.runningToks
          // force the fold BEFORE state.update — the returned iterator
          // is consumed after this function returns
          val out = it.toArray.sortBy(_.doc_id).flatMap { t =>
            if (t.doc_id <= maxId) None // re-delivery: no emit, no state change
            else {
              val start = acc
              acc += t.n_tokens
              maxId = t.doc_id
              Some(PackedDoc(t.doc_id, shard, t.n_tokens, start / seqLen, start % seqLen))
            }
          }
          state.update(ShardState(maxId, acc))
          out.iterator
      }
  }
}
