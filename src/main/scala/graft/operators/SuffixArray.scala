package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix doubling
  * (Manber & Myers 1990; the Flick & Aluru 2015 distributed
  * formulation) — the index behind ExactSubstr-style corpus dedup
  * (Lee et al. 2022 build exactly this over the training corpus).
  *
  * Round k orders every suffix by its first 2^k characters: each
  * position pairs its current rank with the rank of the position 2^k
  * ahead (ONE keyed self equi-join — a missing lookahead ranks -1,
  * which matches byte-comparison semantics where a proper prefix
  * sorts first), and the pair set re-numbers densely via
  * [[DenseId]] (range-sort + per-partition offsets — never a global
  * window). Ranks only refine, so the loop stops the round they
  * become distinct — ceil(log2 L) rounds worst-case, far fewer on
  * natural text (distinct prefixes appear at ~log_σ L characters);
  * non-convergence throws rather than silently truncating.
  *
  * Scale shape: per round ONE self-join + ONE distinct + DenseId's
  * single range shuffle over the position frame — O(L) rows keyed by
  * position, O(partitions) driver state, per-round lineage truncated.
  * At corpus scale the position frame shards like any fact table;
  * nothing materializes the corpus as one string on any executor.
  */
object SuffixArray {

  /** `chars`: one row per corpus position — (`gpos` contiguous
    * 1..L, `code` the character's code point). Returns
    * (gpos, sa_rank): the 1-based lexicographic rank of the suffix
    * starting at gpos (all suffixes distinct — lengths differ).
    */
  def prefixDoubling(chars: DataFrame): DataFrame =
    saFromRounds(buildRounds(chars))

  /** The doubling rounds as a reusable ARTIFACT (every frame already
    * lineage-truncated): consumers that need both the final array and
    * the sparse table ([[saFromRounds]] + [[adjacentLcpFromRounds]])
    * build the rounds ONCE and share them — the session-scoped-cache
    * contract (corpus index = an artifact, not a per-query
    * computation).
    */
  def rounds(chars: DataFrame): Seq[(Long, DataFrame)] = buildRounds(chars)

  /** The suffix array read off a [[rounds]] artifact. */
  def saFromRounds(rounds: Seq[(Long, DataFrame)]): DataFrame =
    rounds.last._2.withColumnRenamed("rank", "sa_rank")

  /** The doubling rounds themselves: (window, rank frame) for windows
    * 1, 2, 4, …, w_max — rank_w[i] = rank_w[j] iff suffixes i and j
    * agree on their first w characters. The last frame's ranks are
    * fully distinct (the suffix array); the earlier frames are the
    * sparse table [[adjacentLcp]] descends.
    */
  private def buildRounds(chars: DataFrame): Seq[(Long, DataFrame)] = {
    val total = chars.count()
    require(total > 0, "empty corpus")
    // densify the window-1 ranks too: if the first characters are
    // already all distinct the loop never runs, and raw code points
    // would leak out as sa_rank (caught by the property spec on 'ca')
    val codeIds = DenseId.withDenseId(
      chars.select(col("code").cast("long").as("code")).distinct(),
      Seq(col("code")), "nid")
    var r = chars
      .select(col("gpos").cast("long").as("gpos"),
        col("code").cast("long").as("code"))
      .join(codeIds, Seq("code"))
      .select(col("gpos"), col("nid").as("rank"))
      .localCheckpoint()
    val rounds = scala.collection.mutable.ArrayBuffer[(Long, DataFrame)]((1L, r))
    var k = 1L
    var distinct = r.select(col("rank")).distinct().count()
    while (distinct < total) {
      require(k <= 2L * total,
        s"prefix doubling failed to converge (k=$k, L=$total)")
      val shifted = r.select((col("gpos") - k).as("gpos"),
        col("rank").as("rank2"))
      val paired = r.join(shifted, Seq("gpos"), "left")
        .select(col("gpos"), col("rank"),
          coalesce(col("rank2"), lit(-1L)).as("rank2"))
      val ids = DenseId.withDenseId(
        paired.select(col("rank"), col("rank2")).distinct(),
        Seq(col("rank"), col("rank2")), "nid")
      r = paired.join(ids, Seq("rank", "rank2"))
        .select(col("gpos"), col("nid").as("rank"))
        .localCheckpoint()
      // nid is dense 1..D, so max(rank) IS the distinct count — one
      // 1-row aggregate instead of a distinct+count job
      distinct = r.agg(max(col("rank"))).head().getLong(0)
      k *= 2
      rounds += ((k, r))
    }
    rounds.toSeq
  }

  /** Longest common prefix of every ADJACENT suffix pair in rank
    * order — max over these IS the longest repeated substring (the
    * ExactSubstr threshold signal). The doubling rounds double as the
    * sparse table: descending over windows w, a pair advances its lcp
    * by w iff the rank_w values at (a+lcp, b+lcp) exist and agree
    * (agreement at window w ⟺ w more common characters; any
    * lcp < w_max is a sum of distinct available windows, and
    * lcp ≥ w_max is impossible — ranks are distinct there). Per
    * level: two keyed lookups on the L-row pair frame; O(log L)
    * levels, lineage truncated per level.
    *
    * Returns (a, b, sa_rank, lcp): positions of the rank-r and
    * rank-(r+1) suffixes and their common-prefix length.
    */
  def adjacentLcp(chars: DataFrame): DataFrame =
    adjacentLcpFromRounds(buildRounds(chars))

  /** [[adjacentLcp]] over a pre-built [[rounds]] artifact — descends
    * the cached sparse table without re-running the doubling.
    */
  def adjacentLcpFromRounds(rounds: Seq[(Long, DataFrame)]): DataFrame = {
    val sa = rounds.last._2
    var cur = sa
      .join(sa.select((col("rank") - 1).as("rank"), col("gpos").as("b")),
        Seq("rank"))
      .select(col("rank").as("sa_rank"), col("gpos").as("a"), col("b"),
        lit(0L).as("lcp"))
    rounds.reverse.foreach { case (w, rf) =>
      cur = cur
        .withColumn("ga", col("a") + col("lcp"))
        .withColumn("gb", col("b") + col("lcp"))
        .join(rf.select(col("gpos").as("ga"), col("rank").as("ra")),
          Seq("ga"), "left")
        .join(rf.select(col("gpos").as("gb"), col("rank").as("rb")),
          Seq("gb"), "left")
        .select(col("sa_rank"), col("a"), col("b"),
          when(col("ra").isNotNull && col("ra") === col("rb"),
            col("lcp") + w).otherwise(col("lcp")).as("lcp"))
        .localCheckpoint()
    }
    cur
  }
}
