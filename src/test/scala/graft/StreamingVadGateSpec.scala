package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.AudioRow
import graft.streaming.StreamingVadGate

/** Stateless streaming VAD gate: streamed clip censuses equal the
  * audio_vad_segments batch query bit for bit on any delivery
  * schedule, re-delivery re-emits identical rows (keyed-sink no-op),
  * and the kernel matches a hand computation on a crafted clip.
  */
class StreamingVadGateSpec extends SparkSuite {
  import spark.implicits._

  test("streamed censuses equal the batch query on the fixture corpus") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 60)
    val clips = Multimodal.audioFrom(docs).collect().toSeq
    val mem = MemoryStream[AudioRow]
    val q = StreamingVadGate.segments(mem.toDS(), frameSamples = 64)
      .writeStream.format("memory").queryName("vad_gate")
      .outputMode("append").start()
    try {
      // deliver across three uneven micro-batches
      val (b1, rest) = clips.splitAt(7)
      val (b2, b3) = rest.splitAt(29)
      Seq(b1, b2, b3).foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = spark.table("vad_gate").as[StreamingVadGate.VadRow]
        .collect().map(r =>
          (r.media_id, r.n_frames, r.n_segments, r.voiced_frames,
            r.longest_segment)).toSet
      // the oracle-green batch query on the same corpus slice
      val batch = SparkEntry.queries("audio_vad_segments")(
        spark, "/root/testdata/sf0.001")
        .filter($"media_id" < 60)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(streamed == batch, "stream ≡ audio_vad_segments on the slice")
    } finally q.stop()
  }

  test("re-delivery re-emits the identical row; kernel matches hand math") {
    implicit val sqlCtx = spark.sqlContext
    // 2 frames of 2 samples: [3,4] energy 25; [30, _pad] energy 900;
    // mean 462.5 → only frame 2 voiced → 1 segment, longest 1
    def le(s: Int) = Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    val payload = (le(3) ++ le(4) ++ le(30)).toArray
    val clip = AudioRow(9L, payload)
    val mem = MemoryStream[AudioRow]
    val q = StreamingVadGate.segments(mem.toDS(), frameSamples = 2)
      .writeStream.format("memory").queryName("vad_gate_replay")
      .outputMode("append").start()
    try {
      mem.addData(clip); q.processAllAvailable()
      mem.addData(clip); q.processAllAvailable() // at-least-once replay
      val rows = spark.table("vad_gate_replay").as[StreamingVadGate.VadRow]
        .collect().toSeq
      assert(rows.size == 2 && rows.distinct.size == 1,
        "replay emits the identical row — a keyed upsert absorbs it")
      assert(rows.head == StreamingVadGate.VadRow(9L, 2L, 1L, 1L, 1L))
    } finally q.stop()
  }
}
