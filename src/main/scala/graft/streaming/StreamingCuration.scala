package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextOps

/** The full streaming INGEST GATE a training-data pipeline runs at the
  * door, composed from this engine's pieces: map-side quality scoring
  * (the one-pass QualityScoreExpr kernel) → stateful exact-dedup gate
  * (first writer wins per content hash) → per-shard sequence packing
  * ([[StreamingPacker]]). Admitted docs leave with their packed layout
  * position; duplicates and low-quality docs never reach the packer,
  * so the layout only ever contains what a batch run over the admitted
  * set would contain (StreamingCurationSpec asserts that ≡).
  *
  * The dedup gate keys state by md5(text) — one long of state (the
  * first admitted doc_id) per DISTINCT content, the streaming face of
  * `Dedup.exactGroups`. Within a micro-batch the group processes in
  * doc_id order, so the admitted doc is deterministic given batch
  * composition; re-delivered or colliding docs emit nothing. (Near-dup
  * gating at ingest is [[StreamingNearDup]]'s banded-LSH state — this
  * gate is the exact tier that runs before it.)
  */
object StreamingCuration {

  import StreamingPacker.{Doc, PackedDoc}

  // public: Encoder-generated code lives outside this object
  final case class Hashed(h: String, doc_id: Long, text: String)

  /** Quality-filter + exact-dedup + pack. `minScore` gates on the
    * kernel's quality score scaled by 1e6 into an exact integer
    * (HALF_UP at 6 decimals inside the kernel), so the gate threshold
    * is integer-deterministic.
    */
  def curatedPack(
      docs: Dataset[Doc], minScoreMicros: Long,
      numShards: Int = 16, seqLen: Long = 2048L): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    val scored = docs
      // round() before the cast: the kernel HALF_UP-rounds to 6
      // decimals, but that decimal is not exactly double-representable,
      // so score*1e6 can sit one ulp below the intended integer and a
      // bare cast (truncation) would admit/reject off-by-one.
      .filter(
        round(TextOps.qualityScore(col("text")) * 1000000).cast("long") >= minScoreMicros)
      .select(md5(col("text")).as("h"), col("doc_id"), col("text")).as[Hashed]
    val admitted = scored
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Hashed], state: GroupState[Long]) =>
          if (state.exists) {
            // content already admitted — everything here is a dup
            Iterator.empty
          } else {
            val first = it.minBy(_.doc_id)
            state.update(first.doc_id)
            Iterator.single(Doc(first.doc_id, first.text))
          }
      }
    StreamingPacker.pack(admitted, numShards, seqLen)
  }
}
