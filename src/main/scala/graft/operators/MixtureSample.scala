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

  /** Rows of `df` selected to hit `budgets(group)` rows per group
    * (groups absent from the map get 0). Appends nothing; output
    * columns = input columns.
    */
  def toCounts(
      df: DataFrame, keyCol: String, groupCol: String,
      budgets: Map[String, Int]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val maxBudget = budgets.values.max
    val budgetCol: Column = budgets.foldLeft(lit(0)) { case (acc, (g, b)) =>
      when(col(groupCol) === lit(g), lit(b)).otherwise(acc)
    }
    val hashed = df
      .withColumn("__ms_h", md5(col(keyCol).cast("string")))
      .withColumn("__ms_budget", budgetCol)
      .filter(col("__ms_budget") > 0)
    graft.plans.TopKPerGroup(
      hashed, Seq(groupCol), Seq(("__ms_h", false), (keyCol, false)), maxBudget)
      .filter(col("topk_rank") <= col("__ms_budget"))
      .drop("__ms_h", "__ms_budget", "topk_rank")
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
