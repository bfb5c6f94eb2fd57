package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingSceneCut
import graft.streaming.StreamingSceneCut.FrameIn

/** Stateful streaming shot-boundary detection: cross-batch diffs equal
  * the batch kernel on the delivered frames, late/duplicate frames are
  * ignored (replay no-op), and per-key state is one frame.
  */
class StreamingSceneCutSpec extends SparkSuite {
  import spark.implicits._

  test("cross-batch diffs, gap handling, and duplicate-delivery no-op") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FrameIn]
    val q = StreamingSceneCut.cuts(mem.toDS(), threshold = 20L)
      .writeStream.format("memory").queryName("scene_cuts")
      .outputMode("append").start()
    try {
      val f0 = Array[Byte](1, 2, 3, 4)
      val f1 = Array[Byte](1, 2, 3, 4)     // identical → diff 0
      val f3 = Array[Byte](11, 12, 13, 14) // +10/byte → diff 40 (idx 2 skipped)
      // batch 1: first two frames of media 7, plus media 8's first
      mem.addData(FrameIn(7L, 0, f0), FrameIn(7L, 1, f1), FrameIn(8L, 0, f3))
      q.processAllAvailable()
      // batch 2: media 7 jumps to idx 3 (gap), media 8 gets idx 1
      mem.addData(FrameIn(7L, 3, f3), FrameIn(8L, 1, f3))
      q.processAllAvailable()
      val rows = spark.table("scene_cuts")
        .as[StreamingSceneCut.CutRow].collect()
        .map(r => (r.media_id, r.frame_idx, r.prev_idx, r.diff, r.is_cut)).toSet
      assert(rows == Set(
        (7L, 1, 0, 0L, 0),   // same-batch pair, no cut
        (7L, 3, 1, 40L, 1),  // cross-batch, gap compares to last SEEN
        (8L, 1, 0, 0L, 0)))
      // duplicate + late re-delivery: nothing new may emit
      val before = spark.table("scene_cuts").count()
      mem.addData(FrameIn(7L, 3, f3), FrameIn(7L, 1, f1))
      q.processAllAvailable()
      assert(spark.table("scene_cuts").count() == before,
        "replayed frames must be a no-op")
    } finally q.stop()
  }

  test("stream equals the batch kernel on in-order full delivery") {
    implicit val sqlCtx = spark.sqlContext
    val payload = Array.tabulate(48)(i => ((i * 37 + 11) % 256).toByte)
    val frames = payload.grouped(16).zipWithIndex
      .map { case (f, i) => FrameIn(5L, i, f) }.toSeq
    val mem = MemoryStream[FrameIn]
    val q = StreamingSceneCut.cuts(mem.toDS(), threshold = 100L)
      .writeStream.format("memory").queryName("scene_cuts_eq")
      .outputMode("append").start()
    try {
      frames.foreach { f => mem.addData(f); q.processAllAvailable() }
      val streamed = spark.table("scene_cuts_eq")
        .as[StreamingSceneCut.CutRow].collect()
        .map(r => (r.frame_idx, r.diff, r.is_cut)).toSet
      val batch = graft.operators.Multimodal.sceneCuts(
        Seq(graft.operators.Multimodal.VideoRow(5L, payload)).toDS(),
        frameBytes = 16, threshold = 100L)
        .collect().map(d => (d.frame_idx, d.diff, d.is_cut)).toSet
      assert(streamed == batch, "stream ≡ batch kernel on the same frames")
    } finally q.stop()
  }
}
