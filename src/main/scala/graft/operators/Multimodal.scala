package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time inside
  * `mapPartitions` (the Scala analog of a pandas UDF over
  * `mapInPandas`: fixed-size batches through a per-batch kernel,
  * no per-row interpreter round trips).
  *
  * The DECODE KERNEL IS A STUB — this container ships no image/audio
  * codecs. [[FakeDecoder]] parses a deterministic fake header instead;
  * swap in a real codec (JavaCV, TwelveMonkeys, …) behind the same
  * `decode` signature and every schema/partitioning/batching decision
  * here carries over unchanged.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, content: Array[Byte],
      source: String, declared_len: Long)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, mean_intensity: Double,
      feature: Array[Float])

  /** STUB decoder: deterministic "decode" that reads a fake 8-byte
    * header (width, height as int32 LE) and summarizes the payload.
    * Replace with a real codec at deploy time — signature stays.
    */
  object FakeDecoder {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Double, Array[Float]) = {
      val w = if (bytes.length >= 4)
        ((bytes(0) & 0xff)) | ((bytes(1) & 0xff) << 8) | ((bytes(2) & 0xff) << 16) else 0
      val h = if (bytes.length >= 8)
        ((bytes(4) & 0xff)) | ((bytes(5) & 0xff) << 8) | ((bytes(6) & 0xff) << 16) else 0
      val body = bytes.drop(8)
      val mean = if (body.isEmpty) 0.0 else body.map(b => (b & 0xff).toDouble).sum / body.length
      // 8-bin byte histogram as the stand-in embedding
      val hist = new Array[Float](8)
      body.foreach(b => hist((b & 0xff) >> 5) += 1f)
      val n = math.max(1, body.length).toFloat
      (w, h, mean, hist.map(_ / n))
    }
  }

  /** Batched feature extraction: iterate each partition in fixed-size
    * batches (mirrors Arrow record-batch shape), run the decode kernel
    * per batch. Wide payloads never leave the executor; output is the
    * compact feature row.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 256): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would open the codec once here (STUB: no-op)
        batch.iterator.map { m =>
          val (w, h, mean, feat) = FakeDecoder.decode(m.kind, m.content)
          MediaFeatures(m.media_id, m.kind, m.content.length, w, h, mean, feat)
        }
      }
    }
  }

  final case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int, content: Array[Byte])

  /** STUB resize: real codecs would decode → scale → re-encode; the
    * stub rewrites the fake header dims and subsamples payload bytes by
    * the same ratio, preserving the batched-executor-side shape.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, batchSize: Int = 256): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val (w, h, _, _) = FakeDecoder.decode(m.kind, m.content)
          val ratio = if (w > 0) targetW.toDouble / w else 1.0
          val body = m.content.drop(8)
          val step = math.max(1, math.round(1 / math.min(1.0, ratio)).toInt)
          val sampled = body.indices.collect { case i if i % step == 0 => body(i) }.toArray
          ResizedMedia(m.media_id, m.kind, math.min(targetW, math.max(w, 1)),
            math.max(1, (h * ratio).toInt), sampled)
        }
      }
    }
  }

  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame sampling for "video": treat the payload as fixed-size
    * frames, keep every `everyN`-th — the executor-side explode shape
    * (one row in, many rows out, payload never on the driver) is the
    * real pattern; the codec is the stub.
    */
  def sampleFrames(
      media: Dataset[MediaRow], frameBytes: Int = 64, everyN: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val body = m.content.drop(8)
      body.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % everyN == 0 => Frame(m.media_id, idx, frame)
      }
    }
  }

  /** Deterministic synthetic media corpus derived from `documents`
    * (the container has no binary fixtures): 8-byte little-endian fake
    * header + UTF-8 payload, assembled byte-exact in a typed map (SQL
    * string functions would UTF-8-mangle bytes ≥ 0x80).
    */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .as[(Long, String, String, Long)]
      .map { case (id, text, source, nChars) =>
        val w = (nChars % 1024).toInt
        val header = Array[Byte](
          (w & 0xff).toByte, ((w >> 8) & 0xff).toByte, ((w >> 16) & 0xff).toByte, 0,
          3, 0, 0, 0)
        MediaRow(
          id,
          if (id % 2 == 0) "image" else "audio",
          header ++ text.getBytes("UTF-8"),
          source, nChars)
      }
  }

  /** End-to-end demo frame: synth corpus → batched decode → features. */
  def featureFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(syntheticMedia(spark, dir))
      .toDF()
      .select(
        col("media_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"),
        round(col("mean_intensity"), 4).as("mean_intensity"),
        round(element_at(col("feature"), 1).cast("double"), 4).as("f0"))
      .orderBy(col("media_id"))
  }
}
