package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mixture assembly: deterministically select a TARGET NUMBER
  * of rows per group (source, language, quality bucket …) — the step
  * that turns "we want 30% web, 30% code, 40% books" into a concrete,
  * reproducible document set.
  *
  * Selection per group = the `budget(group)` rows whose md5(key)
  * sorts lowest. Like [[HashSample]] this is a pure function of the
  * key set: the same rows are picked on any cluster size or engine,
  * and the pick is STABLE UNDER CORPUS GROWTH in the useful direction
  * — a new row displaces at most one previously-picked row (the
  * group's current md5-maximum), it never reshuffles the selection.
  * Unlike fraction-based sampling the output size is exact, which is
  * what a token-budgeted mix needs.
  *
  * Scale shape: rank-within-group rides [[graft.plans.TopKPerGroup]]
  * — a bounded heap of `maxBudget` entries per group on each map
  * task, partials merged after a ≤(partitions × groups × maxBudget)-row
  * exchange — never a per-group sort or a global window. Group count
  * and budgets are bounded (they are the mixture SPEC, written by a
  * human); corpus size is not.
  */
object MixtureSample {

  /** Past this per-group budget, [[toCounts]] switches from the
    * bounded-heap rank to the threshold+bucket-rank path — a 100k-entry
    * heap per (task, group) is the practical memory ceiling.
    */
  val HeapBudgetCap: Int = 100000

  /** Ceiling on the distinct-group domain. The per-group count maps in
    * [[toCountsViaThreshold]] are driver-side (O(#groups)) — sound
    * because the group column is source/lang-shaped (a bounded
    * vocabulary), NOT a data key. A caller grouping by an unbounded
    * key must fail loudly here instead of OOMing the driver.
    */
  val MaxGroups: Int = 65536

  /** Rows of `df` selected to hit `budgets(group)` rows per group
    * (groups absent from the map get 0). Appends nothing; output
    * columns = input columns. Budgets ≤ `heapCap` rank via the
    * bounded-heap [[graft.plans.TopKPerGroup]]; larger budgets (a real
    * mix wants millions of docs per source — no heap should hold
    * that) take [[toCountsViaThreshold]], which selects the same rows.
    */
  def toCounts(
      df: DataFrame, keyCol: String, groupCol: String,
      budgets: Map[String, Int], heapCap: Int = HeapBudgetCap,
      maxGroups: Int = MaxGroups): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val maxBudget = budgets.values.max
    if (maxBudget > heapCap)
      return toCountsViaThreshold(df, keyCol, groupCol, budgets, maxGroups = maxGroups)
    val hashed = withBudgets(df, groupCol, budgets)
      .withColumn("__ms_h", md5(col(keyCol).cast("string")))
    graft.plans.TopKPerGroup(
      hashed, Seq(groupCol), Seq(("__ms_h", false), (keyCol, false)), maxBudget)
      .filter(col("topk_rank") <= col("__ms_budget"))
      .drop("__ms_h", "__ms_budget", "topk_rank")
  }

  /** Attach per-group budgets (and drop zero-budget groups) via a
    * broadcast join on a tiny budgets table — NOT a when-chain: a
    * per-group `when` builds a literal forest whose analysis/codegen
    * cost grows with the spec (the measured CentroidIds lesson), while
    * the broadcast join is flat at any spec size.
    */
  private def withBudgets(
      df: DataFrame, groupCol: String, budgets: Map[String, Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val budgetDf = budgets.toSeq.filter(_._2 > 0)
      .toDF(groupCol, "__ms_budget")
    df.join(broadcast(budgetDf), Seq(groupCol))
  }

  /** The large-budget path — same selection as [[toCounts]], no
    * bounded heap, no global or per-group-sized window:
    *
    *  1. count each group (one agg; O(groups) to the driver — groups
    *     are the human-written mixture spec, bounded by construction);
    *  2. preselect `md5(key) < thresholdHex(margin · budget/n)` per
    *     group — a map-only filter that keeps ≈ margin × budget rows
    *     (uniform hash ⇒ Chernoff-concentrated; margin 2 puts the
    *     shortfall probability below e⁻ᵇᵘᵈᵍᵉᵗ/⁸). A verification agg
    *     CHECKS the preselection actually covered every budget and
    *     doubles the margin until it does, so the result is exact for
    *     any data, not just probably-exact;
    *  3. rank the preselected rows per group WITHOUT sorting them
    *     globally: count per (group, 12-bit hash-prefix bucket) — a
    *     map-side-combining agg — exclusive-scan the ≤4096-row
    *     per-group bucket histogram for bucket base ranks, and
    *     row_number only WITHIN each bucket (≈ margin·budget/4096
    *     rows per window partition);
    *  4. keep rank ≤ budget.
    *
    * Row order inside buckets and the histogram scan use the same
    * (md5, key) order as the heap path, so both paths pick the
    * IDENTICAL row set (equivalence spec-checked).
    */
  def toCountsViaThreshold(
      df: DataFrame, keyCol: String, groupCol: String,
      budgets: Map[String, Int], margin: Double = 2.0,
      maxGroups: Int = MaxGroups): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0), "budgets must be >= 0")
    require(maxGroups >= 1, "maxGroups must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // Deliberately NOT checkpointed: the corpus is scanned twice (the
    // group-count agg, then the preselect) — at 100 TB two map-only
    // scans beat materializing the whole corpus to executor disk, and
    // both scans push column pruning to the source.
    val hashed = withBudgets(df, groupCol, budgets)
      .withColumn("__ms_h", md5(col(keyCol).cast("string")))
    // Driver-side O(#groups) map — bounded-domain assumption enforced:
    // the limit caps what the driver ever pulls, and crossing the
    // ceiling throws instead of OOMing on an unbounded group key.
    val groupRows = hashed
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .limit(maxGroups + 1)
      .collect()
    require(groupRows.length <= maxGroups,
      s"toCountsViaThreshold: group column '$groupCol' exceeds $maxGroups distinct values; " +
        "the per-group budget map is driver-side — group by a bounded domain " +
        "(source/lang), not a data key")
    val groupN: Map[String, Long] =
      groupRows.map(r => r.getString(0) -> r.getLong(1)).toMap

    var m = margin
    var result: Option[DataFrame] = None
    while (result.isEmpty) {
      val thresholdDf = broadcast(
        groupN.toSeq.map { case (g, n) =>
          val b = budgets.getOrElse(g, 0)
          (g, HashSample.thresholdHex(math.min(1.0, if (n == 0) 1.0 else m * b / n)))
        }.toDF(groupCol, "__ms_thresh"))
      val pre = hashed.join(thresholdDf, Seq(groupCol))
        .filter(col("__ms_h") < col("__ms_thresh"))
        .drop("__ms_thresh")
      val bucketed = pre.withColumn("__ms_bkt",
        conv(substring(col("__ms_h"), 1, 3), 16, 10).cast("int"))
      val hist = bucketed.groupBy(col(groupCol), col("__ms_bkt"))
        .agg(count(lit(1)).as("__ms_c"))
        .withColumn("__ms_base",
          coalesce(
            sum(col("__ms_c")).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col(groupCol)).orderBy(col("__ms_bkt"))
                .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
            lit(0L)))
      // exactness check: did the preselection cover every budget?
      // (groups here ⊆ groupN's domain, already under the ceiling)
      val got: Map[String, Long] = hist
        .groupBy(col(groupCol)).agg(sum(col("__ms_c")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val short = groupN.exists { case (g, n) =>
        val want = math.min(n, budgets.getOrElse(g, 0).toLong)
        got.getOrElse(g, 0L) < want
      }
      if (short) m *= 2
      else {
        val inBucket = org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol), col("__ms_bkt"))
          .orderBy(col("__ms_h"), col(keyCol))
        result = Some(
          bucketed
            .join(hist.select(col(groupCol), col("__ms_bkt"), col("__ms_base")),
              Seq(groupCol, "__ms_bkt"))
            .withColumn("__ms_rank", col("__ms_base") + row_number().over(inBucket))
            .filter(col("__ms_rank") <= col("__ms_budget"))
            .drop("__ms_h", "__ms_budget", "__ms_bkt", "__ms_base", "__ms_rank"))
      }
    }
    result.get
  }

  /** DuckDB twin of the per-group rank: selected iff
    * `row_number() OVER (PARTITION BY group ORDER BY md5(key), key)`
    * ≤ the group's budget.
    */
  def selectedSql(
      table: String, keyExpr: String, groupCol: String,
      budgets: Map[String, Int]): String = {
    val cases = budgets.toSeq.sortBy(_._1)
      .map { case (g, b) => s"WHEN '$g' THEN $b" }
      .mkString(" ")
    s"""SELECT * FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY $groupCol
       |    ORDER BY md5(CAST($keyExpr AS VARCHAR)), $keyExpr) AS __rk
       |  FROM $table
       |  WHERE (CASE $groupCol $cases ELSE 0 END) > 0)
       |WHERE __rk <= (CASE $groupCol $cases ELSE 0 END)""".stripMargin
  }
}
