package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDriftGate

/** Streaming CUSUM drift gate: bit-equality with the host-side step
  * replay, alarm/reset semantics, and O(1)-state integer arithmetic.
  */
class StreamingDriftGateSpec extends SparkSuite {
  import spark.implicits._

  private val MU = 10L
  private val SLACK = 1L
  private val H = 6L

  test("per-batch statistics == host step replay; alarms fire and reset") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingDriftGate.toMemorySink(
      StreamingDriftGate.gate(mem.toDS().toDF("key"), "key", MU, SLACK, H),
      "drift")
    try {
      // key "a": batches of 10, 10, 16, 17, 9 — drifts up and alarms;
      // key "b": steady 10s — never alarms.
      val counts = Seq(
        Seq("a" -> 10, "b" -> 10), Seq("a" -> 10, "b" -> 10),
        Seq("a" -> 16, "b" -> 10), Seq("a" -> 17, "b" -> 10),
        Seq("a" -> 9, "b" -> 10))
      counts.foreach { batch =>
        mem.addData(batch.flatMap { case (k, n) => Seq.fill(n)(k) }: _*)
        q.processAllAvailable()
      }
      val got = spark.table("drift").as[StreamingDriftGate.DriftRow].collect()
        .map(r => (r.key, r.batch) -> r).toMap

      // host replay, key by key
      for (key <- Seq("a", "b")) {
        var st = StreamingDriftGate.Cusum(0L, 0L, 0L)
        counts.zipWithIndex.foreach { case (batch, i) =>
          val n = batch.collect { case (`key`, c) => c }.sum.toLong
          val (next, (b, up, down, au, ad)) =
            StreamingDriftGate.step(st, n, MU, SLACK, H)
          st = next
          val row = got((key, b))
          assert(row.n == n && row.cusumUp == up && row.cusumDown == down &&
            row.alarmUp == au && row.alarmDown == ad,
            s"key=$key batch=$b got=$row want n=$n up=$up down=$down au=$au ad=$ad")
          assert(b == i + 1)
        }
      }

      // semantic checks: "a" alarms upward at batch 4 (S⁺ = 5+6 = 11 > 6)
      // then restarts from 0, so batch 5 sees the recharged statistic.
      assert(got(("a", 3L)).cusumUp == 5L && !got(("a", 3L)).alarmUp)
      assert(got(("a", 4L)).alarmUp)
      assert(got(("a", 5L)).cusumUp == 0L) // max(0, 0 + (9-10-1)) = 0
      // "b" never alarms and both statistics stay pinned at 0
      (1L to 5L).foreach { b =>
        val r = got(("b", b))
        assert(r.cusumUp == 0L && r.cusumDown == 0L && !r.alarmUp && !r.alarmDown)
      }
    } finally q.stop()
  }

  test("heartbeat variant: a vanished key keeps stepping and alarms downward") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = StreamingDriftGate.toMemorySink(
      StreamingDriftGate.gateWithHeartbeats(
        mem.toDS().toDF("key", "w"), "key", "w", MU, SLACK, H),
      "drift_hb")
    try {
      // key "c" sends 10 real rows in batch 1, then VANISHES — only
      // its weight-0 registry heartbeat keeps flowing. Without the
      // heartbeat the documented mapGroupsWithState contract would
      // never advance the statistic; with it, S⁻ grows by
      // (μ − 0 − k) = 9 per silent batch and alarms at batch 2
      // (9 > 6), resets, then re-alarms at batch 4.
      val batches = Seq(
        Seq.fill(10)(("c", 1L)) :+ (("c", 0L)),
        Seq(("c", 0L)), Seq(("c", 0L)), Seq(("c", 0L)))
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("drift_hb")
        .as[StreamingDriftGate.DriftRow].collect()
        .map(r => r.batch -> r).toMap
      assert(got(1L).n == 10L && !got(1L).alarmDown)
      assert(got(2L).n == 0L && got(2L).cusumDown == 9L && got(2L).alarmDown)
      assert(got(3L).n == 0L && got(3L).cusumDown == 9L && got(3L).alarmDown)
      assert(got(4L).n == 0L && got(4L).alarmDown)
    } finally q.stop()
  }

  test("heartbeatStream: |keys| weight-0 rows per tick, streaming plan") {
    val hb = StreamingDriftGate.heartbeatStream(spark, Seq("a", "b"))
    assert(hb.isStreaming, "rate × broadcast static keys is a streaming frame")
    assert(hb.columns.toSeq == Seq("key", "w"))
  }
}
