package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-group heavy hitters with BOUNDED state: the
  * Space-Saving summary (Metwally et al. 2005) as
  * mapGroupsWithState — the streaming complement to the batch
  * Count-Min sketch (`count_min_tokens`) and the exact batch top-k
  * (`top_tokens_per_lang`).
  *
  * State per group is exactly `m` (item, count, err) counters, no
  * matter how many distinct items the stream carries. An arriving
  * item already tracked increments its counter; an untracked item
  * evicts the minimum counter and inherits its count as `err` (the
  * possible overestimate). The classic guarantees hold and are what
  * the spec asserts against exact batch counts:
  *   - any item with true count > N/m is IN the summary;
  *   - for every tracked item: true ≤ est ≤ true + err.
  *
  * Space-Saving is arrival-order-dependent, so determinism comes from
  * the same contract as the other streaming operators: items fold in
  * a canonical (sorted) order WITHIN each micro-batch, making the
  * final summary a pure function of the batch sequence — the spec's
  * host-side replay reproduces it counter-for-counter.
  *
  * Each batch emits the group's refreshed top-k rows (Update mode);
  * the shuffle carries (group, item) pairs only.
  */
object StreamingTopK {

  final case class Item(grp: String, item: String)
  final case class Counter(item: String, count: Long, err: Long)
  final case class TopRow(grp: String, item: String, est: Long, err: Long, rnk: Int)

  /** Pure Space-Saving fold — shared by the operator and the spec's
    * host replay. Items must already be in canonical order.
    */
  def fold(state: Map[String, (Long, Long)], items: Seq[String], m: Int): Map[String, (Long, Long)] =
    items.foldLeft(state) { (s, it) =>
      s.get(it) match {
        case Some((c, e)) => s.updated(it, (c + 1, e))
        case None if s.size < m => s.updated(it, (1L, 0L))
        case None =>
          val (minItem, (minC, _)) = s.minBy { case (k, (c, _)) => (c, k) }
          (s - minItem).updated(it, (minC + 1, minC))
      }
    }

  /** Per-group continuous top-k. `m` counters of state; emits `k`
    * rows per group per batch.
    */
  def topK(
      rows: Dataset[org.apache.spark.sql.Row], grpCol: String, itemCol: String,
      m: Int = 64, k: Int = 10): Dataset[TopRow] = {
    import rows.sparkSession.implicits._
    rows
      .select(col(grpCol).cast("string").as("grp"), col(itemCol).cast("string").as("item"))
      .as[Item]
      .groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, it: Iterator[Item], state: GroupState[Map[String, (Long, Long)]]) =>
          val next = fold(
            state.getOption.getOrElse(Map.empty),
            it.map(_.item).toArray.sorted.toIndexedSeq, m)
          state.update(next)
          next.toSeq
            .map { case (item, (c, e)) => (item, c, e) }
            .sortBy { case (item, c, _) => (-c, item) }
            .take(k).zipWithIndex
            .map { case ((item, c, e), i) => TopRow(grp, item, c, e, i + 1) }
            .iterator
      }
  }

  /** Memory-sink writer for tests (Update mode). */
  def toMemorySink(ds: Dataset[TopRow], name: String): org.apache.spark.sql.streaming.StreamingQuery =
    ds.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
}
