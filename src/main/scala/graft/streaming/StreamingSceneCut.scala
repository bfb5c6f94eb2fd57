package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming shot-boundary detection: frames of a video STREAM arrive
  * over time (a demuxer emits them micro-batch by micro-batch), and
  * each media key compares every arriving frame against the LAST
  * frame it has seen — the stateful face of
  * [[graft.operators.Multimodal.sceneCuts]], for ingest pipelines that
  * must gate/sample frames before they ever land.
  *
  * State per media key is ONE frame (the latest by index) — O(frame)
  * bytes regardless of stream length. Within a batch, frames process
  * in frame_idx order; frames at or before the last seen index are
  * IGNORED (late/duplicate delivery — at-least-once sources replay),
  * so the emitted diff sequence is a pure function of the set of
  * delivered frames, and replays are no-ops (the suite's determinism
  * contract). Gaps are allowed: a skipped index compares against the
  * last frame that DID arrive, exactly like the batch operator run on
  * a sampled frame subset.
  */
object StreamingSceneCut {

  final case class FrameIn(media_id: Long, frame_idx: Int, frame: Array[Byte])
  final case class CutRow(
      media_id: Long, frame_idx: Int, prev_idx: Int, diff: Long, is_cut: Int)
  final case class LastFrame(idx: Int, frame: Array[Byte])

  /** Sum of absolute byte differences over the common prefix — the
    * batch kernel's SAD with unsigned byte arithmetic.
    */
  private def sad(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var d = 0L
    var j = 0
    while (j < n) { d += math.abs((a(j) & 0xff) - (b(j) & 0xff)); j += 1 }
    d
  }

  /** Per-media cut stream (Append mode): one CutRow per accepted frame
    * after the first; `is_cut` = diff > threshold.
    */
  def cuts(
      frames: Dataset[FrameIn], threshold: Long): Dataset[CutRow] = {
    import frames.sparkSession.implicits._
    frames
      .groupByKey(_.media_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (media: Long, it: Iterator[FrameIn], state: GroupState[LastFrame]) =>
          var last = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[CutRow]
          it.toSeq.sortBy(_.frame_idx).foreach { f =>
            if (last == null) {
              last = LastFrame(f.frame_idx, f.frame)
            } else if (f.frame_idx > last.idx) {
              val d = sad(f.frame, last.frame)
              out += CutRow(media, f.frame_idx, last.idx, d,
                if (d > threshold) 1 else 0)
              last = LastFrame(f.frame_idx, f.frame)
            } // else: late or duplicate delivery — ignored, replay no-op
          }
          if (last != null) state.update(last)
          out.iterator
      }
  }
}
