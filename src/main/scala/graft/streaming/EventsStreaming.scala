package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` shape (event_id,
  * ts, user_id, event_type, value). The reference is batch-only
  * (SURVEY.md §2.9); this is the streaming tier a training-data
  * pipeline needs: watermarked windowed aggregation, session windows,
  * and custom keyed state.
  *
  * Every function takes a DataFrame that may be either a batch frame or
  * a `readStream` frame — the plans are identical; only the sink differs.
  */
object EventsStreaming {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Tumbling 1-hour windows with a 2-hour watermark: counts + value
    * sums per (window, event_type). Late data beyond the watermark is
    * dropped, state is bounded — safe on an unbounded stream.
    */
  def hourlyWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Session windows (30-minute inactivity gap) per user — the built-in
    * `session_window` operator, watermark-bounded.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** STREAM-STREAM inner join: views ⋈ purchases per user within an
    * attribution horizon. Both sides carry watermarks and the join
    * condition bounds purchase_ts to (view_ts, view_ts + horizon] —
    * the two constraints together let Spark expire buffered rows (a
    * stream-stream join without them holds both streams forever).
    * Emits one row per qualifying (view, purchase) pair, unlike the
    * funnel's first-conversion-only state machine.
    */
  def viewPurchaseJoin(events: DataFrame, horizonMinutes: Int = 60): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    views.join(
      purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("user_id"), col("view_ts"), col("purchase_ts"))
  }

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * count + value total, updated per micro-batch (Update output mode).
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var v = prev.total_value
          batch.foreach { e => n += 1; v += e.value }
          val next = UserRunning(userId, n, v)
          state.update(next)
          next
      }
  }

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)
  // public: the state Encoder's generated code instantiates it
  final case class OpenSession(start: Long, end: Long, n: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState: state
    * holds the open session per user; a ≥30-minute gap closes it and
    * EMITS it (0..n outputs per invocation — the flatMap shape). The
    * still-open session stays in state across micro-batches.
    */
  def sessionizeStateful(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var open = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            open match {
              case Some(s) if t - s.end > gapMs =>
                closed += SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)
                open = Some(OpenSession(t, t, 1))
              case Some(s) =>
                open = Some(OpenSession(s.start, t, s.n + 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
  }

  /** Streaming exact dedup: drop events whose `event_id` was already
    * seen within the watermark horizon — the streaming face of
    * [[graft.operators.Dedup.exactGroups]]; state is bounded by the
    * watermark (old keys age out).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join a stream against a (bounded) batch
    * dimension — the streaming face of the loader's FK-resolution
    * broadcast joins (`etl/cargar_postgres.py:353-363`). The static
    * side re-plans per micro-batch (picking up dim updates between
    * batches) and broadcasts, so the stream side never shuffles.
    */
  def enrichStream(
      events: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim), Seq(keyCol), "left")

  /** Idempotent streaming append — the streaming face of the
    * reference's `ON CONFLICT DO NOTHING` load
    * (`etl/cargar_postgres.py:135,248`): each micro-batch drops
    * in-batch duplicate keys, anti-joins keys already in the sink, and
    * appends only the remainder. Re-delivered batches (at-least-once
    * sources, restarts) therefore cannot double rows — the file-sink
    * equivalent of the unique-key constraint.
    *
    * At scale the anti-join reads only the sink's key column (parquet
    * column pruning); for key-heavy sinks swap the read for a
    * partition-pruned slice or a Bloom pre-filter
    * ([[graft.operators.IncrementalDedup]]).
    */
  def idempotentAppend(
      events: DataFrame, out: String, keyCol: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val newRows = batch.dropDuplicates(keyCol)
        val existing =
          try Some(spark.read.parquet(out).select(keyCol))
          catch { case _: org.apache.spark.sql.AnalysisException => None } // first batch: no sink yet
        val fresh = existing match {
          case Some(e) => newRows.join(e, Seq(keyCol), "left_anti")
          case None => newRows
        }
        fresh.write.mode("append").parquet(out)
        ()
      }
      .outputMode("append")
      .start()

  /** Batch↔stream equivalence check hook: the windowed agg run in batch
    * mode over the same frame (used by tests and Verify twins).
    */
  def hourlyWindowAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  val updateMode: OutputMode = OutputMode.Update()
}
