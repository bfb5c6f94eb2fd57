package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.SpanDedup

/** Streaming maintenance of the ExactSubstr SPAN CENSUS — the
  * Structured Streaming rendition of the incremental span-dedup
  * contract (`SpanDedup.spanCensus`/`mergeCensus`/
  * `exciseAgainstCensus`, oracle-gated by `dedup_span_incremental`):
  * document micro-batches fold their span censuses into the held
  * census inside `foreachBatch`, and because distinct-doc counts over
  * DISJOINT doc sets are additive, the folded census EQUALS the
  * one-shot census over every delivered document — batch-composition-
  * independent (spec-proven).
  *
  * Re-delivery contract (the StreamingKnnAppend recipe): arriving doc
  * ids already seen drop via one left-anti join before any hashing,
  * so at-least-once replays are a no-op — effectively-once without a
  * custom state store.
  *
  * Scale shape: per-batch work is batch-proportional (one span_hash
  * aggregation over the batch + one census-grain merge); the census
  * and seen-id frames re-materialize via localCheckpoint each fold so
  * plan depth stays flat over an unbounded stream (on a cluster these
  * are the parquet/Delta state tables a daily job maintains).
  */
final class StreamingSpanCensus(
    n: Int, idCol: String = "doc_id", textCol: String = "text") {

  @volatile private var state: Option[(DataFrame, DataFrame)] = None

  /** The latest (span_hash, n_docs) census (None until the first batch). */
  def census: Option[DataFrame] = state.map(_._2)
  def seenIds: Option[DataFrame] = state.map(_._1)

  /** Fold one document batch. Same-batch duplicate ids collapse to one
    * row (ids are stable keys).
    */
  def loadBatch(batch: DataFrame): Unit = synchronized {
    val rows = batch.select(col(idCol), col(textCol)).dropDuplicates(idCol)
    state = Some(state match {
      case None =>
        val b = rows.localCheckpoint()
        (b.select(col(idCol)).localCheckpoint(),
          SpanDedup.spanCensus(b, idCol, textCol, n).localCheckpoint())
      case Some((seen, cen)) =>
        val fresh = rows.join(seen, Seq(idCol), "left_anti").localCheckpoint()
        if (fresh.isEmpty) (seen, cen)
        else (
          seen.unionByName(fresh.select(col(idCol))).localCheckpoint(),
          SpanDedup.mergeCensus(
            cen, SpanDedup.spanCensus(fresh, idCol, textCol, n))
            .localCheckpoint())
    })
  }

  /** Serve the census: excise a fresh batch against the current state
    * (the daily-clean path of `dedup_span_incremental`). Throws before
    * the first fold — an empty census would silently under-excise.
    */
  def excise(batch: DataFrame, maxDocs: Long): DataFrame =
    SpanDedup.exciseAgainstCensus(
      batch, idCol, textCol, n, maxDocs,
      census.getOrElse(throw new IllegalStateException(
        "no census folded yet")))

  /** Wire a document stream into the folder. */
  def writer(docStream: DataFrame): DataStreamWriter[Row] =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) loadBatch(batch)
      }
}
