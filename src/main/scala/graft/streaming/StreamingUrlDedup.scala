package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming canonical-URL admission gate — the ingest-time face of
  * the batch `url_canonical_dedup` query: a crawl frontier delivers
  * pages continuously, and only the FIRST page per canonical URL may
  * enter the corpus; case variants, default ports, tracking params,
  * and fragments must not smuggle a duplicate through.
  *
  * Shape: canonicalization is the map-side
  * [[graft.functions.UrlCanon]] kernel (no shuffle); the only stateful
  * stage is `flatMapGroupsWithState` keyed by canon_url whose state is
  * the single admitted page id — O(1) longs per live canonical URL,
  * the smallest state any dedup gate can hold. Within a micro-batch
  * the minimum page_id wins (deterministic under batch reordering);
  * across batches the gate is first-arrival (ingest order IS the
  * keep-first policy at a frontier). Re-delivery of an already-
  * admitted page emits nothing — replay is a state no-op, so an
  * exactly-once sink sees each canonical URL at most once ever.
  * Production deployments with a finite dedup horizon add an
  * event-time TTL via `GroupStateTimeout`; the corpus-wide variant
  * swaps state into the persisted-index pattern
  * ([[graft.operators.LshIndex]]'s broadcast-probe shape).
  */
object StreamingUrlDedup {

  final case class Page(page_id: Long, url: String)
  final case class CanonPage(canon_url: String, page_id: Long)
  final case class Admitted(canon_url: String, page_id: Long)

  /** Pages admitted by the gate: the first arrival per canonical URL
    * (min page_id within a micro-batch).
    */
  def admitted(pages: Dataset[Page]): Dataset[Admitted] = {
    import pages.sparkSession.implicits._
    pages.toDF()
      .select(
        graft.functions.exprs.urlCanon(col("url")).as("canon_url"),
        col("page_id"))
      .filter(col("canon_url").isNotNull)
      .as[CanonPage]
      .groupByKey(_.canon_url)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[CanonPage], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty // duplicates and replays: rejected
          else {
            val keeper = rows.map(_.page_id).min
            state.update(keeper)
            Iterator.single(Admitted(key, keeper))
          }
      }
  }

  /** Convenience writer for tests: run to a memory sink in Append mode. */
  def toMemorySink(ds: Dataset[Admitted], name: String): org.apache.spark.sql.streaming.StreamingQuery =
    ds.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
}
