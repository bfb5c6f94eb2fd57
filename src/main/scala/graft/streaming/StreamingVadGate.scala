package graft.streaming

import org.apache.spark.sql.Dataset

import graft.operators.Multimodal.AudioRow

/** Streaming energy-gated VAD segmentation: audio clips arrive whole
  * (one payload row per clip — the [[graft.operators.Multimodal.audioFrom]]
  * shape), and each clip's voiced-segment census is a PURE FUNCTION of
  * its own payload (frame energies, the clip-mean integer gate, run
  * lengths), so the streaming face is a STATELESS map — no state
  * store, no watermark, and replay idempotence is structural: a
  * re-delivered clip re-emits the identical row, which any downstream
  * keyed sink (the LshIndex upsert convention) absorbs as a no-op.
  * This is the ingest-time gate a speech-data pipeline applies before
  * payloads ever land: the emitted rows are compact integer stats —
  * payload bytes never leave the map stage.
  *
  * The batch-equivalence contract (StreamingVadGateSpec): streamed
  * rows over any delivery schedule equal the `audio_vad_segments`
  * batch query on the same corpus, bit for bit — the frame math is
  * [[graft.operators.Multimodal.audioFrameEnergies]]'s (Σs² over
  * `frameSamples`-sample frames, zero-padded tail), the gate is
  * energy·n_frames > total (strictly above the clip mean), and runs
  * are maximal consecutive voiced-frame intervals.
  */
object StreamingVadGate {

  final case class VadRow(
      media_id: Long, n_frames: Long, n_segments: Long,
      voiced_frames: Long, longest_segment: Long)

  /** Per-clip VAD census — the kernel shared by every delivery of the
    * same payload (deterministic; exposed for the spec's hand checks).
    */
  private[graft] def vadOf(
      media_id: Long, content: Array[Byte], frameSamples: Int): VadRow = {
    val n = content.length / 2
    val nf = (n + frameSamples - 1) / frameSamples
    val energy = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var e = 0L
      var i = f * frameSamples
      val end = math.min((f + 1) * frameSamples, n)
      while (i < end) {
        val s = ((content(2 * i) & 0xff) | (content(2 * i + 1) << 8)).toShort.toInt
        e += s.toLong * s
        i += 1
      }
      energy(f) = e
      f += 1
    }
    var tot = 0L
    energy.foreach(tot += _)
    var segs = 0L; var voiced = 0L; var longest = 0L; var run = 0L
    var g = 0
    while (g < nf) {
      if (energy(g) * nf > tot) {
        run += 1
        voiced += 1
        if (run == 1L) segs += 1
        if (run > longest) longest = run
      } else run = 0L
      g += 1
    }
    VadRow(media_id, nf.toLong, segs, voiced, longest)
  }

  /** The streaming transform: map each arriving clip to its census. */
  def segments(
      clips: Dataset[AudioRow], frameSamples: Int = 64): Dataset[VadRow] = {
    import clips.sparkSession.implicits._
    clips.map(c => vadOf(c.media_id, c.content, frameSamples))
  }
}
