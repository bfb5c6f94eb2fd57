package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE merge induction (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * vocabulary-learning step of an LLM tokenizer pipeline: k rounds of
  * (count adjacent symbol pairs corpus-wide, weighted by word
  * frequency) → (merge the argmax pair everywhere).
  *
  * 100 TB shape: the corpus is touched ONCE — one token explode + one
  * groupBy builds the word-frequency vocabulary, after which every
  * round runs on the vocab frame (distinct words — millions of rows
  * against a 100 TB corpus, itself distributed, never collected). Each
  * round is one pair explode + one aggregation + a 1-row argmax
  * collect; the winning merge ships back as a literal, so applying it
  * is a map-only string replace with no shuffle. k rounds = k skinny
  * aggregations, the same shape as the collocations queries.
  *
  * Determinism: ties on pair count break by (pair_count DESC,
  * left_sym ASC, right_sym ASC) — a total order over distinct pairs —
  * so the merge table is independent of partitioning and layout.
  *
  * Greedy application uses the double-space encoding: a word's symbol
  * sequence is `" s1  s2  ...  sn "` (two spaces BETWEEN symbols, one
  * at each end; tokens are whitespace-split so symbols never contain
  * spaces). Replacing `" l  r "` with `" lr "` is then exactly the
  * classic left-to-right non-overlapping merge: the pattern's outer
  * single spaces anchor symbol boundaries (no false suffix/prefix
  * matches), and because a replacement re-emits those outer spaces,
  * an adjacent following `l r` occurrence still matches — e.g.
  * `[a,a,a,a]` under merge (a,a) → `[aa,aa]`, while `[a,a,a]` →
  * `[aa,a]`, matching the reference implementation; a freshly merged
  * symbol never re-merges in the same round (its own pattern no
  * longer matches, since l ≠ lr). Both engines' `replace` scans
  * left-to-right and continues after each replacement, so the DuckDB
  * oracle replays the identical semantics.
  */
object Bpe {

  /** Learn `numMerges` merges from whitespace-tokenized `textCol`.
    * Returns the merge table: (step INT, left_sym, right_sym,
    * pair_count LONG), one row per round, ordered by step. Stops early
    * if no adjacent pair remains.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    // Corpus pass: word-frequency vocab + initial per-character
    // symbol encoding. localCheckpoint so the k rounds never re-scan
    // the corpus (lineage truncation, the load-once/query-many rule).
    var vocab = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn(
        "enc",
        concat(
          lit(" "),
          array_join(
            transform(
              sequence(lit(1), length(col("word"))),
              i => col("word").substr(i, lit(1))),
            "  "),
          lit(" ")))
      .localCheckpoint()

    val merges = Seq.newBuilder[Row]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val top = vocab
        .select(col("freq"), split(trim(col("enc")), "  ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(
          col("freq"),
          explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "j -> struct(syms[j-1] AS left_sym, syms[j] AS right_sym))")).as("p"))
        .groupBy(col("p.left_sym").as("left_sym"), col("p.right_sym").as("right_sym"))
        .agg(sum(col("freq")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("left_sym").asc, col("right_sym").asc)
        .limit(1)
        .collect() // exactly one row per round — the argmax merge
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getAs[String]("left_sym")
        val r = top(0).getAs[String]("right_sym")
        merges += Row(step, l, r, top(0).getAs[Long]("pair_count"))
        vocab = vocab.withColumn(
          "enc",
          replace(col("enc"), lit(s" $l  $r "), lit(s" $l$r ")))
        step += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result(), 1),
      StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField("left_sym", StringType, nullable = false),
        StructField("right_sym", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Serving-side segmentation encoding for a learned merge list —
    * the one-pass [[graft.functions.SpaceEncode]] byte kernel
    * (lowercase + whitespace→`|` fence + per-code-point spacing,
    * byte-identical to the 3-regexp_replace chain the oracle states,
    * in a single traversal) followed by one literal codegen'd
    * StringReplace per merge. Never a HOF over per-token arrays (the
    * measured ~50× interpreted-lambda penalty; see CLAUDE.md): the
    * whole DOCUMENT is one string with `|` marking token boundaries
    * (`" t  h  e  |  f  a  st "`), which the boundary-anchored merge
    * patterns can never cross. Merges ship as literals, so the corpus
    * pass is map-only with no shuffle.
    */
  def segmentEncoding(text: org.apache.spark.sql.Column, merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val spaced = graft.functions.exprs.spaceEncode(coalesce(text, lit("")))
    merges.foldLeft(spaced) { case (acc, (l, r)) =>
      replace(acc, lit(s" $l  $r "), lit(s" $l$r "))
    }
  }

  /** Subword count from a [[segmentEncoding]] string: double-space
    * units are subwords plus the `|` token separators (tokenCount-1 of
    * them when any token exists).
    */
  def subwordCount(enc: org.apache.spark.sql.Column, nToks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(length(trim(enc)) === 0, lit(0L))
      .otherwise(
        size(split(trim(enc), "  ")).cast("long") -
          when(nToks > 1, nToks - 1).otherwise(lit(0)).cast("long"))
}
