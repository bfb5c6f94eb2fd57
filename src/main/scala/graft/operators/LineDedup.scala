package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line/paragraph-grain dedup, the C4 / RefinedWeb curation step the
  * document-grain dedup family can't express: boilerplate (nav bars,
  * cookie banners, legal footers) repeats across MANY documents while
  * each host document is unique, so document near-dup never fires —
  * the fix is to hash each LINE and drop lines whose hash appears in
  * more than `maxDocs` distinct documents, then reassemble the
  * remaining lines in original order (C4 dropped lines seen >1 time;
  * RefinedWeb §3.3 does the same at line grain).
  *
  * 100 TB shape: one explode (line grain), one hash-key aggregation
  * for the blacklist, one broadcast join back. The blacklist is tiny
  * by construction — only lines repeated across >maxDocs docs — so
  * the probe never shuffles the corpus; reassembly is the single
  * doc_id shuffle. Exploded lines carry (doc_id, pos, md5) plus the
  * line string itself — no signatures, no vectors. The exploded frame
  * feeds both the blacklist aggregate and the probe side, and the
  * probe has no exchange to dedup the split against, so it is
  * localCheckpoint'ed (the measured broadcast-blacklist rule — see
  * CLAUDE.md on dedup_winnow_pairs).
  */
object LineDedup {

  /** Returns one row per input document: `idCol`, `clean_text` (lines
    * surviving the blacklist, original order, '\n'-joined; empty
    * string when nothing survives), `n_lines`, `n_dropped`.
    *
    * A line is dropped when its md5 appears in MORE THAN `maxDocs`
    * distinct documents; duplicate occurrences inside one document
    * don't count toward the threshold (multiset repeats within a doc
    * are the repetition kernel's job, not dedup's).
    */
  def dropCommonLines(
      docs: DataFrame, idCol: String, textCol: String,
      maxDocs: Long): DataFrame = {
    val lines = docs
      .select(
        col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("pos", "line")))
      .withColumn("h", md5(col("line")))
      .localCheckpoint()
    val blacklist = lines
      .groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select(col("h"), lit(true).as("dropped"))
    lines
      .join(broadcast(blacklist), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("dropped").isNull, struct(col("pos"), col("line"))))),
            kept => kept.getField("line")),
          "\n").as("clean_text"))
  }
}
