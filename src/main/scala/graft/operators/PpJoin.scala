package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered set-similarity join (SSJoin/PPJoin family —
  * Chaudhuri, Ganti & Kaushik ICDE 2006; Xiao, Wang, Lin & Yu WWW
  * 2008 — public literature): find all document pairs whose DISTINCT
  * token sets have Jaccard ≥ α, WITHOUT the full inverted-index
  * pair blow-up.
  *
  * The prefix-filter theorem: order every document's tokens by one
  * GLOBAL total order and keep only the first
  * p = |t| − ⌈α·|t|⌉ + 1 tokens (the "prefix"). If J(a,b) ≥ α the
  * two prefixes must share a token — so a prefix×prefix equi-join is
  * a LOSSLESS candidate generator. Ordering by ascending document
  * frequency puts the RAREST tokens in prefixes, which is what makes
  * the candidate volume collapse: stopwords almost never reach a
  * prefix, so the hot-key join lists the naive index join drowns in
  * simply never form.
  *
  * Everything is exact integer arithmetic: ⌈α|t|⌉ with α = num/den is
  * (num·|t| + den − 1) div den, and the Jaccard test
  * |∩|/(|a|+|b|−|∩|) ≥ α cross-multiplies to
  * den·|∩| ≥ num·(|a|+|b|−|∩|) — no doubles anywhere, so the result
  * set is BIT-IDENTICAL to the naive all-pairs join (which is exactly
  * what the oracle computes).
  *
  * Scale shape (100 TB): document frequencies are one skinny agg on
  * the (doc, token) grain; the global order is a property of the
  * token row (df, token) — no broadcast rank table needed; candidate
  * generation joins PREFIX rows only (≈ (1−α)·|t| + 1 per doc);
  * intersection counting re-joins the full index for CANDIDATE pairs
  * only, carrying ids — the verify cost is proportional to true-ish
  * pairs, not all pairs.
  */
object PpJoin {

  /** All pairs (id_a < id_b) with Jaccard(tokens_a, tokens_b) ≥ num/den.
    * Output: (id_a, id_b, inter, size_a, size_b) — integer evidence
    * columns, union = size_a + size_b − inter.
    *
    * `docs` must carry `idCol` and an array `tokensCol` of any
    * orderable element type (strings, shingle hashes, …); element
    * multiplicity is ignored (set semantics). Any global total order
    * yields the same verified result — the order only shapes WHICH
    * prefix rows generate candidates, never the final pair set.
    */
  def jaccardPairs(
      docs: DataFrame, idCol: String, tokensCol: String,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den >= num, s"threshold $num/$den must be in (0,1]")
    // distinct (doc, token) grain — set semantics. NOT checkpointed:
    // dt feeds four consumers (df agg, ranked window, verify joins,
    // size agg) but a localCheckpoint A/B'd within noise at sf0.1
    // (r15 iso medians 2.35 s plain vs 2.20 s checkpointed) — AQE
    // exchange reuse already dedups the distinct across consumers,
    // the PrefixSum lesson again.
    val dt = docs
      .select(col(idCol).as("doc"), explode(col(tokensCol)).as("tok"))
      .distinct()
    // global order key: ascending document frequency, token asc as the
    // deterministic tie-break; |t| rides the same window pass
    val df = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ranked = dt.join(df, "tok")
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("doc")).orderBy(col("df"), col("tok"))))
      .withColumn("size",
        count(lit(1)).over(Window.partitionBy(col("doc"))))
    // prefix length p = |t| − ⌈α|t|⌉ + 1 (exact integer ceil)
    val prefix = ranked.filter(
      col("pos") <= col("size") - expr(s"(($num * size) + $den - 1) div $den") + 1)
    val candidates = prefix.as("a")
      .join(prefix.as("b"), col("a.tok") === col("b.tok") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    // verify: intersection count via two id-keyed joins of the FULL
    // token grain, candidates only
    val inter = candidates
      .join(dt.select(col("doc").as("id_a"), col("tok")), Seq("id_a"))
      .join(dt.select(col("doc").as("id_b"), col("tok")), Seq("id_b", "tok"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    val sizes = dt.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    inter
      .join(sizes.select(col("doc").as("id_a"), col("sz").as("size_a")), Seq("id_a"))
      .join(sizes.select(col("doc").as("id_b"), col("sz").as("size_b")), Seq("id_b"))
      .filter(expr(s"$den * inter >= $num * (size_a + size_b - inter)"))
      .select(col("id_a"), col("id_b"), col("inter"),
        col("size_a"), col("size_b"))
  }
}
