package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the prep step between a curated
  * corpus and an embedding index (RAG) or a fixed-context encoder:
  * each document becomes overlapping token windows of `window` tokens
  * advancing by `stride`, with the LAST window right-aligned to the
  * document end (the HF-tokenizer overflow convention) so every token
  * is covered and all windows are full-width whenever the document is
  * at least `window` tokens long (equal-size inputs are what the
  * embedding batcher wants). Shorter documents produce one short
  * chunk; empty documents produce none.
  *
  * 100 TB shape: a bounded map-side explode — ≤ n/stride + 1 rows per
  * doc, each carrying only its own window of tokens — with no shuffle
  * at all until whatever consumes the chunks aggregates them. Chunk
  * count and starts are exact integer arithmetic, so layout can't
  * enter and a SQL oracle restates the windows verbatim.
  */
object Chunking {

  /** Output: (idCol, chunk_idx, start_tok, chunk_tokens, chunk_text),
    * one row per window, chunk_text = window tokens joined by ' '.
    */
  def tokenWindows(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("n", size(col("toks")).cast("long"))
      // chunk count: one window, plus one per stride needed to move the
      // right edge from `window` to n (ceil division)
      .withColumn(
        "n_chunks",
        lit(1L) + expr(s"(greatest(n - $window, 0L) + ${stride - 1}) div $stride"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn(
        "start_tok",
        least(col("chunk_idx") * stride, greatest(col("n") - window, lit(0L))))
      .withColumn(
        "chunk",
        slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(window)))
      .select(
        col(idCol),
        col("chunk_idx"),
        col("start_tok"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}
