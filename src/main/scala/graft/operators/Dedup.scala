package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around one shuffle-bounded pattern that survives 100 TB inputs:
  *
  *  - exact / normalized dedup: hash-groupBy on a content digest — one
  *    shuffle keyed by digest, no full-text comparisons.
  *  - n-gram Jaccard near-dup: inverted-index self-join on shingles
  *    (never an O(N²) cross join); hot shingles are capped by document
  *    frequency so a stop-shingle can't produce a quadratic bucket.
  *  - MinHash+LSH and SimHash live in [[MinHashLsh]] / [[SimHash]].
  */
object Dedup {

  /** Exact-duplicate groups by content digest. Returns one row per
    * distinct content: representative (min) id, member count.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup after aggressive normalization (lowercase + whitespace
    * collapse) — catches trivially re-formatted copies.
    */
  def normalizedGroups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(coalesce(col(textCol), lit(""))), "\\s+", " "))
    df.groupBy(md5(norm.cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** Word n-gram shingle set (distinct, first-occurrence order), as an
    * array column — the one-pass [[graft.functions.WordNgrams]] kernel.
    * Bit-equal to the Column composition
    * `array_distinct(transform(sequence…, concat_ws(" ", slice(toks,…))))`
    * (AnalyticsOpsSpec asserts the equivalence) but without the
    * per-gram interpreted lambda: measured 3.4s → sub-second on the
    * contamination sweep at sf0.1.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.exprs.wordNgrams(text, n)

  /** Winnowing-fingerprint near-dup pairs: docs sharing ≥ `minShared`
    * fingerprints ([[graft.functions.WinnowFingerprint]] — robust to
    * insertions/reorders since fingerprints are local). Same
    * inverted-index shape as [[ngramJaccardPairs]]: explode fingerprints,
    * cap hot ones, self-join, count shared per pair.
    */
  def winnowPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minShared: Int = 10,
      maxFingerprintDf: Int = 1000, md5Based: Boolean = false): DataFrame = {
    val fpExpr =
      if (md5Based) graft.functions.md5exprs.winnowFingerprintMd5(col(textCol), k, w)
      else graft.functions.exprs.winnowFingerprint(col(textCol), k, w)
    // localCheckpoint so the md5-per-position kernel runs ONCE: the
    // broadcast-blacklist probe side has no exchange, so nothing else
    // dedups the three references (blacklist agg + both self-join
    // sides) — r5 measured the missing checkpoint as a 2.4× regression
    // on dedup_winnow_pairs (same lesson as MinHashLsh.scala:82).
    val fps = df.select(
      col(idCol).as("doc_id"),
      explode(fpExpr).as("fp"))
      .localCheckpoint()
    // Hot-fingerprint blacklist via groupBy + broadcast anti-join — no
    // per-partition sort in the candidate stage (vs count-over-window;
    // the map-side combine shrinks the agg exchange to one row per
    // distinct fingerprint, and only over-cap ones broadcast).
    val hotFps = broadcast(
      fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxFingerprintDf)
        .select(col("fp")))
    val capped = fps.join(hotFps, Seq("fp"), "left_anti")
    val a = capped.select(col("doc_id").as("id_a"), col("fp"))
    val b = capped.select(col("doc_id").as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }

  /** Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard ≥
    * threshold) via inverted index:
    * doc→shingles → explode → (cap hot shingles by doc frequency) →
    * self-join on shingle → count shared per pair → |A∩B| / (|A|+|B|−|A∩B|).
    *
    * `maxShingleDf` bounds the worst-case pair blowup: a shingle shared
    * by d docs contributes d² pairs; capping d keeps the join linear-ish
    * in corpus size (standard trick — such shingles carry no dedup
    * signal anyway).
    */
  /** [[ngramJaccardPairs]] with the set-overlap counters retained
    * (id_a, id_b, n_a, n_b, shared, jaccard) — callers that band or
    * re-threshold pairs (threshold curves) need the exact integers,
    * not just the one-division jaccard.
    */
  def ngramJaccardPairStats(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, maxShingleDf: Int = 1000): DataFrame = {
    // 64-bit shingle hashes as join keys ([[graft.functions.NgramHashes]]):
    // same distinct-set cardinalities, ~6× cheaper to build, cheaper to
    // shuffle than shingle strings.
    val docs = df.select(
      col(idCol).as("doc_id"),
      graft.functions.exprs.ngramHashes(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)
    // localCheckpoint for the same reason as [[winnowPairs]]: the
    // shingle-hash kernel + explode feed the blacklist agg and both
    // self-join sides, and the broadcast probe has no exchange to reuse.
    val inverted = docs
      .select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
      .localCheckpoint()
    // Same blacklist shape as [[winnowPairs]]: document frequency per
    // shingle via map-side-combined groupBy, over-cap shingles
    // broadcast, candidate rows filtered by a map-only anti-join.
    val hotShingles = broadcast(
      inverted.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxShingleDf)
        .select(col("shingle")))
    val capped = inverted.join(hotShingles, Seq("shingle"), "left_anti")
    val a = capped.select(col("doc_id").as("id_a"), col("n_sh").as("n_a"), col("shingle"))
    val b = capped.select(col("doc_id").as("id_b"), col("n_sh").as("n_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
  }

  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, maxShingleDf: Int = 1000): DataFrame =
    ngramJaccardPairStats(df, idCol, textCol, n, threshold, maxShingleDf)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Connected components over an undirected pair graph — the step that
    * turns near-dup PAIRS into dedup CLUSTERS (keep one representative
    * per component; the component label IS the min member id, the
    * natural keeper).
    *
    * Hash-min label propagation WITH pointer jumping: every vertex
    * starts labeled with its own id; each round a vertex takes the min
    * of its label and its neighbors' labels (one hop), then shortcuts
    * through its label's label (`l(v) := l(l(v))`, the union-find
    * path-halving step as a self-join). Shortcutting halves label-chain
    * depth every round, so convergence is O(log diameter) rounds — a
    * 1000-hop dup chain closes in ~10 rounds where plain propagation
    * needs 1000. Each round is a bounded number of shuffles keyed by
    * vertex id, and labels localCheckpoint per round — iterative
    * algorithms otherwise stack lineage until the driver chokes (same
    * lesson as Star.append). The change count reads the just-
    * materialized checkpoint blocks (the old label rides along as a
    * column), not an extra join against the previous round.
    *
    * Non-convergence within `maxIter` throws instead of silently
    * returning partial labels (round-2 ADVICE): wrong cluster labels
    * would make keepRepresentatives keep multiple docs per cluster.
    * With shortcutting, maxIter=25 covers any graph of diameter
    * < 2²⁵ — unreachable in practice.
    *
    * Output: (id, component) for every vertex that appears in a pair;
    * vertices with no pairs are singletons by definition and are left
    * to the caller (component = own id).
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 25): DataFrame = {
    // No distinct: near-dup pair generators emit each undirected pair
    // once (id_a < id_b), so the two-direction union is already
    // duplicate-free — and min-propagation is idempotent under
    // duplicate edges anyway, so correctness never depends on it.
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionAll(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .localCheckpoint()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // one-hop neighbor min
      val neighborMin = edges
        .join(labels.select(col("id").as("v"), col("component")), Seq("v"))
        .groupBy(col("u").as("id")).agg(min(col("component")).as("_nbr"))
      // materialized: the pointer-jump self-join below reads stepped
      // on BOTH sides with different join keys, so without a
      // checkpoint the one-hop join+agg subplan would execute twice
      // per round (ReuseExchange can't dedup across differing keys)
      val stepped = labels.withColumnRenamed("component", "_old")
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("_old"),
          least(col("_old"), coalesce(col("_nbr"), col("_old"))).as("component"))
        .localCheckpoint()
      // pointer jump: follow the label's own label. Labels are always
      // vertex ids inside the same component (inductively: mins of
      // member labels), so the lookup stays within the component and
      // is monotone non-increasing — fixpoint unchanged, depth halved.
      val next = stepped
        .join(
          stepped.select(col("id").as("component"), col("component").as("_cc2")),
          Seq("component"), "left")
        .select(col("id"), col("_old"),
          coalesce(col("_cc2"), col("component")).as("component"))
        .localCheckpoint()
      changed = next.filter(col("component") =!= col("_old")).count()
      labels = next.drop("_old")
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing) — component labels would be wrong")
    labels
  }

  /** Corpus dedup by cluster: keep ONE representative (the min member
    * id = its component label) per near-dup cluster, drop the rest.
    * Docs that appear in no pair are singletons and pass through —
    * only non-representative cluster members join the drop set, so the
    * anti-join's build side is bounded by the duplicate count, not the
    * corpus.
    */
  def keepRepresentatives(
      df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame =
    keepRepresentativesFromLabels(df, idCol, connectedComponents(pairs, aCol, bCol))

  /** [[keepRepresentatives]] over PRECOMPUTED component labels
    * (id, component) — the load-once/query-many path when the cluster
    * artifact is already built: one anti-join, no CC rounds.
    */
  def keepRepresentativesFromLabels(
      df: DataFrame, idCol: String, labels: DataFrame): DataFrame = {
    val drops = labels
      .filter(col("component") =!= col("id"))
      .select(col("id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }
}
