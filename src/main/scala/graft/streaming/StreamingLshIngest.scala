package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.LshIndex

/** Streaming face of the persisted LSH index ([[LshIndex]]): a
  * document stream appends into the near-dup index at ingest, so the
  * index a nightly batch job would rebuild stays current batch-over-
  * batch. Probes must be QUIESCED against in-flight appends: each
  * append swaps datasets via ParquetMerge's two-rename exchange, so a
  * probe racing the swap can read a momentarily absent target (the
  * specs probe only after the query stops / between micro-batches —
  * serve from a compacted snapshot, or retry through the `_old`
  * recovery path, when serving must overlap ingest).
  *
  * Each micro-batch rides [[LshIndex.append]] inside foreachBatch —
  * the batch operator verbatim, so streamed and batch-built indexes
  * are IDENTICAL row sets (StreamingLshIngestSpec asserts it), and
  * replay safety is inherited rather than re-implemented: appends are
  * doc-id-keyed upserts, so a re-delivered micro-batch (the
  * at-least-once failure mode foreachBatch exposes) is an exact
  * no-op. Signature hashing happens map-side in the batch's own job;
  * no state store, no watermark — the INDEX is the state, which is
  * what makes the stream restartable from any checkpoint.
  *
  * The index must exist (its hash parameters live in the persisted
  * meta, the [[LshIndex.Params]] rule) — production trains/builds the
  * index offline and streams deltas into it; at 100 TB the per-batch
  * upsert becomes append-only files + a [[LshIndex.compact]] pass on
  * the usual housekeeping cadence (`dedup_index_compact` proves
  * compaction preserves probe results exactly).
  */
object StreamingLshIngest {

  /** Start appending the document stream into the index at `path`.
    * `docs` must be a streaming frame with `idCol` and `textCol`.
    * Pass `checkpointLocation` for a RESTARTABLE ingest: a query
    * started again on the same checkpoint resumes from the last
    * committed offsets, and any replayed in-flight batch lands as a
    * doc-id-keyed no-op (StreamingRecoverySpec proves the full
    * stop → restart → identical-index round trip).
    */
  def start(
      docs: DataFrame, idCol: String, textCol: String,
      path: String, checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        LshIndex.append(batch.sparkSession, path, batch, idCol, textCol)
      }
    checkpointLocation.fold(w)(cp => w.option("checkpointLocation", cp)).start()
  }
}
