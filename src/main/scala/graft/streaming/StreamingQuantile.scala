package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming quantile sketching: the stateful face of the
  * `quantile_sketch_price` histogram — per-group p50/p90/p99 tracked
  * at INGEST time (latency percentiles per endpoint, token-count
  * percentiles per source) without storing the values.
  *
  * State per group is the equi-width bin-count map — O(occupied bins)
  * longs, constant in stream length for bounded value domains; the
  * shuffle carries (group, value) pairs only. Each micro-batch folds
  * its values into the bins and emits the refreshed quantile row,
  * read off the cumulative crossing with the SAME integer-fraction
  * targets as the batch query (k = (num·n + den − 1) div den,
  * estimate = bin upper bound).
  *
  * Contract difference vs [[StreamingDistinct]]: KMV reduce is
  * idempotent, so replays are state no-ops there; bin COUNTS are
  * additive, so this sketch requires exactly-once delivery (or an
  * upstream dedup stage — [[StreamingCuration]]'s md5 gate is the
  * in-repo example). The spec therefore asserts incremental ≡ batch
  * over PARTITIONED batches, which is the deployment contract.
  */
object StreamingQuantile {

  final case class Keyed(scope: String, v: Long)
  final case class ScopeQuantiles(
      scope: String, n: Long, p50: Long, p90: Long, p99: Long)

  /** The batch-identical quantile read: cumulative bin crossing at
    * k = (num·n + den − 1) div den, reported as the bin upper bound.
    */
  private[graft] def quantileOf(
      bins: Map[Long, Long], n: Long, num: Long, den: Long,
      binWidth: Long): Long = {
    val k = (num * n + den - 1) / den
    var cum = 0L
    var ans = Long.MaxValue
    val it = bins.toSeq.sortBy(_._1).iterator
    while (ans == Long.MaxValue && it.hasNext) {
      val (b, c) = it.next()
      cum += c
      if (cum >= k) ans = (b + 1) * binWidth - 1
    }
    ans
  }

  /** Keyed long values → per-scope quantile rows, refreshed each batch. */
  def estimates(
      rows: Dataset[org.apache.spark.sql.Row], scopeCol: String,
      valueCol: String, binWidth: Long = 131072L): Dataset[ScopeQuantiles] = {
    import rows.sparkSession.implicits._
    rows
      .select(col(scopeCol).cast("string").as("scope"),
        col(valueCol).cast("long").as("v"))
      .as[Keyed]
      .groupByKey(_.scope)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (scope: String, it: Iterator[Keyed], state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          it.foreach { r =>
            val b = Math.floorDiv(r.v, binWidth)
            m = m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          state.update(m)
          val n = m.valuesIterator.sum
          ScopeQuantiles(scope, n,
            quantileOf(m, n, 1, 2, binWidth),
            quantileOf(m, n, 9, 10, binWidth),
            quantileOf(m, n, 99, 100, binWidth))
      }
  }

  /** Convenience writer for tests: run to a memory sink in Update mode. */
  def toMemorySink(
      ds: Dataset[ScopeQuantiles], name: String): org.apache.spark.sql.streaming.StreamingQuery =
    ds.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
}
