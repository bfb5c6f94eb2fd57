package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift gate (Page 1954) with O(1) state per key:
  * the streaming complement to the batch `cusum_drift_orders` query.
  * Each key tracks the classic one-sided CUSUM statistics over its
  * per-micro-batch observation count:
  *
  *   S⁺ ← max(0, S⁺ + (x − μ − k))   (upward drift)
  *   S⁻ ← max(0, S⁻ + (μ − x − k))   (downward drift)
  *
  * with integer target μ, slack k and alarm threshold h — everything
  * stays exact Long arithmetic, so replays are bit-identical. An alarm
  * batch resets its side's statistic (the standard recharge), and the
  * emitted row carries both statistics plus the alarm flags so a
  * downstream gate can quarantine the key's shard.
  *
  * State per key is two Longs and a batch counter, independent of
  * stream length; the shuffle carries (key) pairs only. Determinism
  * contract shared with the other streaming operators: the statistic
  * is a pure fold over the per-batch COUNT (arrival order within a
  * batch is irrelevant — count is commutative), so the final state is
  * a pure function of the batch sequence, which the spec replays
  * host-side.
  */
object StreamingDriftGate {

  final case class Obs(key: String)
  final case class Cusum(batch: Long, up: Long, down: Long)
  final case class DriftRow(
      key: String, batch: Long, n: Long,
      cusumUp: Long, cusumDown: Long,
      alarmUp: Boolean, alarmDown: Boolean)

  /** Pure per-batch CUSUM step — shared by the operator and the
    * spec's host replay. Returns (new state, (batch, S⁺, S⁻, alarms)).
    */
  def step(
      state: Cusum, n: Long, mu: Long, slack: Long, h: Long)
      : (Cusum, (Long, Long, Long, Boolean, Boolean)) = {
    val up0 = math.max(0L, state.up + (n - mu - slack))
    val down0 = math.max(0L, state.down + (mu - n - slack))
    val alarmUp = up0 > h
    val alarmDown = down0 > h
    val next = Cusum(
      state.batch + 1,
      if (alarmUp) 0L else up0,
      if (alarmDown) 0L else down0)
    (next, (state.batch + 1, up0, down0, alarmUp, alarmDown))
  }

  /** Per-key continuous drift gate over the micro-batch count of
    * `keyCol` rows. Emits one row per key per batch (Update mode).
    *
    * CONTRACT (documented limitation, r8 advice): mapGroupsWithState
    * fires only for keys PRESENT in a micro-batch, so a key whose
    * volume drops to exactly zero does not advance its statistic that
    * batch — the downward CUSUM only accumulates across batches where
    * the key still appears at least once, and per-key `batch` counts
    * key-visible batches, not global micro-batch numbers. For
    * vanished-key detection use [[gateWithHeartbeats]] +
    * [[heartbeatStream]]: a registry heartbeat (weight 0) keeps every
    * registered key present in each batch, so the statistic advances
    * with n=0 and the downward alarm can fire — while the state
    * operator stays a pure deterministic fold (no processing-time
    * timeouts, replays bit-identical).
    */
  def gate(
      rows: Dataset[org.apache.spark.sql.Row], keyCol: String,
      mu: Long, slack: Long, h: Long): Dataset[DriftRow] = {
    import rows.sparkSession.implicits._
    rows
      .select(col(keyCol).cast("string").as("key"))
      .as[Obs]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Obs], state: GroupState[Cusum]) =>
          val n = it.size.toLong
          val prev = state.getOption.getOrElse(Cusum(0L, 0L, 0L))
          val (next, (b, u, d, au, ad)) = step(prev, n, mu, slack, h)
          state.update(next)
          DriftRow(key, b, n, u, d, au, ad)
      }
  }

  /** Memory-sink writer for tests (Update mode). */
  def toMemorySink(ds: Dataset[DriftRow], name: String): org.apache.spark.sql.streaming.StreamingQuery =
    ds.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()

  final case class WObs(key: String, w: Long)

  /** Heartbeat-aware gate (the r8-advice upgrade): rows carry a
    * WEIGHT — 1 for a real observation, 0 for a registry heartbeat —
    * and the per-batch statistic advances on Σw, so a key whose real
    * volume drops to ZERO still steps (n=0) as long as its heartbeat
    * flows, and the downward CUSUM can alarm on vanished keys. The
    * heartbeat union happens in the SOURCE stream (see
    * [[heartbeatStream]]), which keeps the state operator itself a
    * pure deterministic fold — no processing-time timeouts, so
    * replays stay bit-identical (the suite's determinism contract).
    */
  def gateWithHeartbeats(
      rows: Dataset[org.apache.spark.sql.Row], keyCol: String,
      weightCol: String, mu: Long, slack: Long, h: Long): Dataset[DriftRow] = {
    import rows.sparkSession.implicits._
    rows
      .select(col(keyCol).cast("string").as("key"),
        col(weightCol).cast("long").as("w"))
      .as[WObs]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[WObs], state: GroupState[Cusum]) =>
          val n = it.map(_.w).sum
          val prev = state.getOption.getOrElse(Cusum(0L, 0L, 0L))
          val (next, (b, u, d, au, ad)) = step(prev, n, mu, slack, h)
          state.update(next)
          DriftRow(key, b, n, u, d, au, ad)
      }
  }

  /** Registry heartbeat source: one weight-0 row per registered key
    * per rate tick — union this with the real observation stream
    * (mapped to weight 1) before [[gateWithHeartbeats]]. The key list
    * is a broadcast static side of a stream-static join, so the
    * heartbeat volume is |keys| per tick regardless of data volume.
    */
  def heartbeatStream(
      spark: org.apache.spark.sql.SparkSession, keys: Seq[String],
      rowsPerSecond: Int = 1): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .crossJoin(broadcast(keys.toDF("key")))
      .select(col("key"), lit(0L).as("w"))
  }
}
