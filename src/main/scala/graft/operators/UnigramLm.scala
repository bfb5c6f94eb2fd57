package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM vocabulary induction (Kudo, ACL 2018 — the SentencePiece
  * unigram model), completing the tokenizer-training triad next to
  * [[Bpe.train]] (merge argmax by raw pair count) and
  * [[WordPiece.train]] (merge argmax by pair likelihood): instead of
  * GROWING a vocabulary by merges, unigram-LM starts from a large seed
  * of candidate pieces and SHRINKS it — alternating (E) re-segment the
  * corpus under the current vocabulary and (M/prune) drop the pieces
  * that contribute least, until the surviving inventory is the model.
  *
  * Deterministic hard-EM variant (the soft forward–backward EM of the
  * paper accumulates log-likelihoods — sums over doubles whose
  * addition order is engine-dependent, unusable under the repo's
  * bit-exact oracle contract): the E-step segments each word by
  * MAXIMAL MUNCH (longest vocabulary match, left to right — WordPiece's
  * serving rule), which is integer-only and order-free; the prune step
  * drops the bottom ⌊|multi-char pieces|/pruneDenom⌋ pieces by
  * (usage count asc, piece asc) — a total order on exact BIGINTs.
  * Single-character pieces are never pruned (the paper's invariant:
  * the model must keep full coverage). Piece probabilities are emitted
  * once at the end as the single fixed-order IEEE division
  * double(cnt)/double(total) — never a sum over doubles.
  *
  * 100 TB shape: the corpus is scanned ONCE into the distinct-word
  * frequency frame ([[Bpe.train]]'s opening move — word-grain, not
  * token-grain, so EM rounds never touch the corpus again); the static
  * (word, pos, candidate-piece) frame is materialized once and reused
  * by every round; each round is one broadcast-vocab join (the
  * vocabulary is a model artifact, bounded, always broadcastable) +
  * two word-keyed aggregations + a map-side array walk; the prune is a
  * TakeOrdered over the vocab-sized count frame with a single bounded
  * driver count (the [[Bpe]]/[[MixtureSample]] bounded-collect
  * pattern). Nothing in a round is corpus-proportional.
  */
object UnigramLm {

  /** Serving-side segmentation: maximal-munch each distinct word
    * against a FIXED piece inventory (the inference rule [[train]]'s
    * E-step uses). Unlike training, the vocabulary need not cover
    * every character — an unmatched position falls back to the single
    * character as its own piece (the `<unk>`-pass-through convention),
    * so segmentation is total on any input. Returns (word,
    * pieces array<string>). One broadcast-vocab join + one word-keyed
    * aggregation + a map-side walk; word-grain, so the corpus joins
    * against the result instead of re-segmenting per occurrence.
    */
  def segmentWords(
      words: DataFrame, vocab: DataFrame, maxPieceLen: Int = 6): DataFrame = {
    val cand = words
      .select(
        col("word"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(word)), p ->
             |  transform(sequence(1, least($maxPieceLen, length(word) - p + 1)), l ->
             |    named_struct('pos', p, 'piece', substring(word, p, l)))))""".stripMargin)).as("c"))
      .select(col("word"), col("c.pos").as("pos"), col("c.piece").as("piece"))
    val steps = cand
      .join(broadcast(vocab), Seq("piece"))
      .groupBy(col("word"), col("pos"))
      .agg(max(length(col("piece"))).as("step"))
      .groupBy(col("word"))
      .agg(map_from_entries(collect_list(struct(col("pos"), col("step")))).as("m"))
    words
      .join(steps, Seq("word"), "left")
      .withColumn("st", expr(
        "transform(sequence(1, length(word)), i -> coalesce(element_at(m, i), 1))"))
      .withColumn("starts", expr(
        """aggregate(sequence(1, length(word)),
          |  named_struct('nxt', 1, 'acc', cast(array() as array<int>)),
          |  (a, i) -> IF(i = a.nxt,
          |    named_struct('nxt', a.nxt + element_at(st, i),
          |                 'acc', concat(a.acc, array(i))),
          |    a),
          |  a -> a.acc)""".stripMargin))
      .withColumn("pieces", expr(
        "transform(starts, s -> substring(word, s, element_at(st, s)))"))
      .select(col("word"), col("pieces"))
  }

  /** Train by iterative segment-and-prune. Returns the surviving
    * vocabulary after `rounds` rounds: (piece, cnt = frequency-weighted
    * usage count under the final E-step segmentation, prob = cnt/total
    * over survivors).
    *
    * @param maxPieceLen seed pieces are all substrings up to this length
    * @param minCount    multi-char seed pieces need at least this
    *                    frequency-weighted substring count
    * @param rounds      segment→prune rounds
    * @param pruneDenom  each round drops ⌊multi/pruneDenom⌋ pieces
    * @param maxWordLen  words longer than this are excluded from
    *                    training (caps the per-word walk; the oracle
    *                    states the same filter)
    */
  def train(
      docs: DataFrame, textCol: String,
      maxPieceLen: Int = 6, minCount: Long = 8, rounds: Int = 2,
      pruneDenom: Int = 4, maxWordLen: Int = 20): DataFrame = {
    require(maxPieceLen > 0 && rounds > 0 && pruneDenom > 1)

    // one corpus scan → distinct words with frequencies (Bpe shape)
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .localCheckpoint()

    // static candidate frame: every (pos, piece) substring occurrence
    // up to maxPieceLen — built once, scanned by every round's
    // vocab-membership join
    val cand = words
      .select(
        col("word"), col("freq"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(word)), p ->
             |  transform(sequence(1, least($maxPieceLen, length(word) - p + 1)), l ->
             |    named_struct('pos', p, 'piece', substring(word, p, l)))))""".stripMargin)).as("c"))
      .select(col("word"), col("freq"), col("c.pos").as("pos"), col("c.piece").as("piece"))
      .localCheckpoint()

    val seedCnt = cand
      .groupBy(col("piece"))
      .agg(sum(col("freq")).as("cnt"))
    // single chars never prune (full-coverage invariant)
    val chars = seedCnt
      .filter(length(col("piece")) === 1)
      .select(col("piece"))
      .localCheckpoint()
    var vocab = seedCnt
      .filter(length(col("piece")) === 1 || col("cnt") >= minCount)
      .select(col("piece"))
      .localCheckpoint()

    var used: DataFrame = null
    var round = 0
    while (round < rounds) {
      // E-step: maximal-munch step length at every position (chars are
      // always in vocab, so step >= 1 and the walk covers the word),
      // then the greedy walk as a map-side array fold — pieces used
      // are the substrings at the walked start positions
      val steps = cand
        .join(broadcast(vocab), Seq("piece"))
        .groupBy(col("word"), col("freq"), col("pos"))
        .agg(max(length(col("piece"))).as("step"))
        .groupBy(col("word"), col("freq"))
        .agg(array_sort(collect_list(struct(col("pos"), col("step")))).as("ps"))
        .withColumn("st", expr("transform(ps, x -> x.step)"))
        .withColumn("starts", expr(
          """aggregate(sequence(1, length(word)),
            |  named_struct('nxt', 1, 'acc', cast(array() as array<int>)),
            |  (a, i) -> IF(i = a.nxt,
            |    named_struct('nxt', a.nxt + element_at(st, i),
            |                 'acc', concat(a.acc, array(i))),
            |    a),
            |  a -> a.acc)""".stripMargin))
      used = steps
        .select(
          col("freq"),
          explode(col("starts")).as("s"),
          col("word"), col("st"))
        .select(col("freq"), expr("substring(word, s, element_at(st, s))").as("piece"))
        .groupBy(col("piece"))
        .agg(sum(col("freq")).as("cnt"))
        .localCheckpoint()

      // prune: bottom floor(multi/pruneDenom) multi-char pieces by
      // (cnt asc, piece asc); the count is the one bounded driver value
      val multi = used.filter(length(col("piece")) >= 2)
      val k = (multi.count() / pruneDenom).toInt
      val bottom = multi
        .orderBy(col("cnt").asc, col("piece").asc)
        .limit(k)
        .select(col("piece"))
      vocab = used.select(col("piece"))
        .join(bottom, Seq("piece"), "left_anti")
        .union(chars)
        .distinct()
        .localCheckpoint()
      round += 1
    }

    // survivors of the final prune with their final-round usage counts
    val surv = used.join(vocab, Seq("piece"))
    val total = surv.agg(sum(col("cnt")).as("total_cnt"))
    surv.crossJoin(broadcast(total))
      .withColumn("prob",
        col("cnt").cast("double") / col("total_cnt").cast("double"))
      .select(col("piece"), col("cnt"), col("prob"))
  }
}
