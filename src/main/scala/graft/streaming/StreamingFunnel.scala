package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.EventsStreaming.Event

/** Streaming analog of [[graft.operators.Funnel]]: first `from` event,
  * then first `to` event strictly after it, emitted the micro-batch
  * the conversion completes — via `flatMapGroupsWithState` keyed by
  * user.
  *
  * Per-user state is one timestamp plus a flag — constant-size
  * regardless of event volume, the property that lets a million-user
  * stream hold its whole funnel state in executor memory. Events
  * inside a micro-batch are sorted by ts before folding, so batch
  * boundaries can't reorder a view past its purchase; each conversion
  * is emitted exactly once (Append mode — emissions are never
  * retracted, so a view arriving later than its user's already-counted
  * conversion does not re-fire it). For a finite attribution horizon,
  * swap NoTimeout for an event-time timeout and the state self-expires.
  */
object StreamingFunnel {

  final case class Conversion(
      user_id: Long, first_view: Timestamp, first_purchase: Timestamp,
      us_to_convert: Long)

  // public: the state Encoder's generated code instantiates it.
  // firstFromUs = Long.MinValue ⇒ no `from` event seen yet.
  final case class FunnelState(firstFromUs: Long, converted: Boolean)

  /** Epoch microseconds of a Timestamp (getTime alone truncates to ms). */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def conversions(
      events: Dataset[Event], from: String, to: String): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == from || e.event_type == to)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(Long.MinValue, converted = false))
          val out = Seq.newBuilder[Conversion]
          // micro-batch iterators carry no ordering guarantee: sort by
          // (ts, type) so a same-batch view precedes its purchase-after
          // while an at-instant purchase (ties) stays a non-conversion
          val sorted = batch.toArray.sortBy(e => (micros(e.ts), e.event_type))
          sorted.foreach { e =>
            val us = micros(e.ts)
            if (e.event_type == from) {
              if (st.firstFromUs == Long.MinValue || us < st.firstFromUs)
                st = st.copy(firstFromUs = us)
            } else if (!st.converted && st.firstFromUs != Long.MinValue
                && us > st.firstFromUs) {
              out += Conversion(userId, fromMicros(st.firstFromUs), fromMicros(us),
                us - st.firstFromUs)
              st = st.copy(converted = true)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
