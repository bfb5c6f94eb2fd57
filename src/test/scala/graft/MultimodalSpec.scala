package graft

import graft.operators.Multimodal

/** Binary-column plumbing: schema, batching, and the deterministic
  * stub decode (FIXME-real-codec boundary is FakeDecoder.decode).
  */
class MultimodalSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("syntheticMedia: binary payload + typed metadata schema") {
    val m = Multimodal.syntheticMedia(spark, dir)
    val schema = m.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(m.count() == 500)
  }

  test("extractFeatures: batched decode produces stable features") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, dir), batchSize = 64)
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.foreach { f =>
      assert(f.n_bytes > 8, "payload after header")
      assert(f.height == 3, "fake header height")
      assert(f.feature.length == 8 && math.abs(f.feature.sum - 1.0f) < 1e-3,
        "normalized 8-bin histogram")
    }
    // determinism across runs / batch sizes
    val again = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(spark, dir), batchSize = 7).collect()
    assert(rows.sortBy(_.media_id).map(_.mean_intensity).toSeq ==
      again.sortBy(_.media_id).map(_.mean_intensity).toSeq)
  }

  test("resize + frame sampling: executor-side, deterministic shapes") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val resized = Multimodal.resize(media, targetW = 16).collect()
    assert(resized.length == 500)
    assert(resized.forall(_.width <= 1024))
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, everyN = 4)
    val perDoc = frames.groupBy("media_id").count().collect()
    assert(perDoc.nonEmpty)
    // every 4th frame of ceil(len/32) frames
    val one = Multimodal.syntheticMedia(spark, dir).filter(_.media_id == 0).collect()(0)
    val expected = ((one.content.length - 8) + 31) / 32
    val got = frames.filter(_.media_id == 0).count()
    assert(got == (expected + 3) / 4, s"$got vs ceil($expected/4)")
  }

  test("featureFrame: compact output, no binary column leaves the plan") {
    val df = Multimodal.featureFrame(spark, dir)
    assert(!df.schema.fields.exists(_.dataType.typeName == "binary"))
    assert(df.count() == 500)
  }
}
