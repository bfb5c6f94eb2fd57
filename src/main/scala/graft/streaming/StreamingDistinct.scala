package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{KmvSketch, Md5Hash}

/** Streaming distinct-count sketching: the stateful face of
  * [[graft.functions.KmvSketch]] (the `kmv_distinct_orders` query) for
  * pipelines that track per-group cardinality at INGEST time — unique
  * users per event type, unique documents per source — without ever
  * storing the key sets.
  *
  * State is EXACTLY the batch sketch buffer: one fixed k-long array
  * per group (sorted ascending, MaxValue-padded), updated with the
  * same `reduce` the batch aggregator runs. Because KMV reduce is
  * idempotent (a hash already in the sketch, or ≥ the k-th value, is
  * a no-op) and order-insensitive, replayed batches and reordered
  * delivery leave the state bit-identical to the batch sketch of the
  * union — StreamingDistinctSpec asserts the ≡ and the replay no-op.
  *
  * Per group the state is O(k) longs, constant in stream length; the
  * shuffle carries (group, hash) pairs only. Each micro-batch emits
  * the group's refreshed (k_seen, kth_hash, est_distinct) row —
  * estimator identical to the batch query's scaled-integer form.
  */
object StreamingDistinct {

  final case class Keyed(scope: String, h: Long)
  final case class ScopeCard(
      scope: String, k_seen: Long, kth_hash: Long, est_distinct: Long)

  /** Keyed rows → per-scope cardinality rows, refreshed each batch.
    * `keyCol` is hashed with the oracle-compatible md5-lower63.
    */
  def estimates(
      rows: Dataset[org.apache.spark.sql.Row], scopeCol: String,
      keyCol: String, k: Int = 256): Dataset[ScopeCard] = {
    import rows.sparkSession.implicits._
    val agg = new KmvSketch(k)
    rows
      .select(
        col(scopeCol).cast("string").as("scope"),
        Md5Hash.lower63Col(col(keyCol).cast("string")).as("h"))
      .as[Keyed]
      .groupByKey(_.scope)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (scope: String, it: Iterator[Keyed], state: GroupState[Array[Long]]) =>
          var b = state.getOption.getOrElse(agg.zero)
          it.foreach(r => b = agg.reduce(b, r.h))
          state.update(b)
          val kept = agg.finish(b)
          val est =
            if (kept.size < k) kept.size.toLong
            else 9187343239835811840L / math.max(kept.last >> 8, 1L)
          ScopeCard(scope, kept.size.toLong,
            if (kept.isEmpty) 0L else kept.last, est)
      }
  }

  /** Convenience writer for tests: run to a memory sink in Update mode. */
  def toMemorySink(ds: Dataset[ScopeCard], name: String): org.apache.spark.sql.streaming.StreamingQuery =
    ds.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
}
