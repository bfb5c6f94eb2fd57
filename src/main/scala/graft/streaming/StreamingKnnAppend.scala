package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.KnnGraph

/** Streaming kNN-graph maintenance: micro-batches of (id, vector) rows
  * fold into a corpus-wide kNN graph via
  * [[KnnGraph.appendWithCentroids]] inside `foreachBatch` — the
  * Structured Streaming rendition of the daily-ingest index contract
  * (the batch append whose merge identity makes the incremental result
  * EQUAL to a full rebuild, spec-proven in KnnGraphSpec).
  *
  * Why foreachBatch and not a streaming aggregation: the fold is a
  * cross-batch graph update against held state (yesterday's edges +
  * the seen corpus) whose per-batch work is a multi-join DataFrame
  * pipeline — exactly the foreachBatch escape hatch. The quantizer is
  * FIXED at construction (the production index artifact — retrain is
  * the separate rare event quantified by `knn_graph_retrain_drift`),
  * so every batch routes identically and the final graph is a pure
  * function of the SET of delivered ids.
  *
  * Re-delivery contract: arriving ids already in the corpus are
  * dropped by one left-anti join on the seen-id frame before any
  * scoring, so at-least-once re-delivery (post-restart replays) is a
  * no-op — effectively-once without a custom state store (the
  * Star.append recipe).
  *
  * Scale shape: per-batch cost is proportional to the BATCH (fresh
  * probes ⋈ full index + base probes ⋈ fresh index — never
  * corpus × corpus); corpus and graph frames re-materialize via
  * localCheckpoint each fold, so plan depth stays flat over an
  * unbounded stream (the lineage-truncation law; on a cluster this is
  * the parquet/Delta state write).
  */
final class StreamingKnnAppend(
    cs: Seq[Seq[Double]], nprobe: Int, k: Int,
    idCol: String = "vec_id", vecCol: String = "embedding") {

  @volatile private var state: Option[(DataFrame, DataFrame)] = None

  /** The latest (corpus, graph) pair (None until the first batch). */
  def corpus: Option[DataFrame] = state.map(_._1)
  def graph: Option[DataFrame] = state.map(_._2)

  /** Fold one vector batch into the graph. Same-batch duplicate ids
    * collapse to one row (ids are stable keys — a re-sent id carries
    * the same vector, so any representative is THE representative).
    */
  def loadBatch(batch: DataFrame): Unit = synchronized {
    val rows = batch.select(col(idCol), col(vecCol))
      .dropDuplicates(idCol)
    state = Some(state match {
      case None =>
        val b = rows.localCheckpoint()
        (b, KnnGraph.buildWithCentroids(b, idCol, vecCol, k, cs, nprobe)
          .localCheckpoint())
      case Some((base, knn)) =>
        val fresh = rows
          .join(base.select(col(idCol)), Seq(idCol), "left_anti")
          .localCheckpoint()
        if (fresh.isEmpty) (base, knn)
        else (
          base.unionByName(fresh).localCheckpoint(),
          KnnGraph.appendWithCentroids(
            knn, base, fresh, idCol, vecCol, k, cs, nprobe)
            .localCheckpoint())
    })
  }

  /** Wire a vector stream into the folder. Caller starts/stops the
    * returned writer (`.start()` + `processAllAvailable` in tests).
    */
  def writer(vecStream: DataFrame): DataStreamWriter[Row] =
    vecStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) loadBatch(batch)
      }
}
