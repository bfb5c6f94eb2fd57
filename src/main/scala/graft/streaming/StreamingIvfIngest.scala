package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.IvfStore

/** Streaming face of the persisted IVF index ([[IvfStore]]) — the
  * vector-tier sibling of [[StreamingLshIngest]]: an embedding stream
  * appends into the inverted lists at ingest, assigned map-side with
  * the STORED centroids (quantizer trained offline; parameters live in
  * the index, never at call sites). Each micro-batch rides
  * [[IvfStore.append]] inside foreachBatch, so streamed and
  * batch-built stores are identical row sets and a re-delivered
  * micro-batch is an exact no-op (vec-id-keyed upsert) — the index IS
  * the state, restartable from any checkpoint. At 100 TB the per-batch
  * upsert becomes append-only files + an [[IvfStore.compact]] pass.
  */
object StreamingIvfIngest {

  /** Start appending the embedding stream into the store at `path`. */
  def start(
      vecs: DataFrame, idCol: String, vecCol: String,
      path: String): StreamingQuery =
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IvfStore.append(batch.sparkSession, path, batch, idCol, vecCol)
      }
      .start()
}
