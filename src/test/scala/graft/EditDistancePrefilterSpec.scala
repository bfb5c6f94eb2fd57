package graft

import org.apache.spark.sql.functions._

/** [[graft.plans.EditDistancePrefilter]]: the length guard must appear
  * in optimized plans, never change row semantics (incl. nulls), and
  * be a fixed point (no guard-of-guard growth).
  */
class EditDistancePrefilterSpec extends SparkSuite {
  import spark.implicits._

  // parquet-backed so the filter survives optimization (a local
  // relation would be constant-folded by ConvertToLocalRelation)
  private lazy val pairs = {
    val p = Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_name").as("a"),
        when(col("p_partkey") % 7 === 0, lit(null))
          .otherwise(reverse(col("p_name"))).as("b"))
    p
  }

  test("guard appears once in the optimized plan and stays stable") {
    val df = pairs.filter(expr("levenshtein(a, b) <= 3"))
    val opt = df.queryExecution.optimizedPlan
    val s = opt.toString
    assert(s.contains("abs((length(a") || s.contains("abs((length("),
      s"no length guard in:\n$s")
    // fixed point: re-applying the rule changes nothing
    val again = graft.plans.EditDistancePrefilter(opt)
    assert(again.fastEquals(opt), "rule must be idempotent")
    // exactly one levenshtein and one abs-guard
    assert("levenshtein".r.findAllIn(s).size == 1)
  }

  test("row semantics unchanged, including null operands and NOT") {
    def bruteLev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val rows = pairs.as[(String, String)].collect()
    val want = rows.filter { case (a, b) => a != null && b != null && bruteLev(a, b) <= 3 }.toSet
    val got = pairs.filter(expr("levenshtein(a, b) <= 3"))
      .as[(String, String)].collect().toSet
    assert(got == want)
    // NOT form: null rows drop on both sides (3VL), non-null rows flip
    val gotNot = pairs.filter(!expr("levenshtein(a, b) <= 3"))
      .as[(String, String)].collect().toSet
    val wantNot = rows.filter { case (a, b) => a != null && b != null && bruteLev(a, b) > 3 }.toSet
    assert(gotNot == wantNot)
  }

  test("all four comparison spellings are guarded") {
    Seq("levenshtein(a,b) <= 3", "levenshtein(a,b) < 4",
      "3 >= levenshtein(a,b)", "4 > levenshtein(a,b)").foreach { p =>
      val s = pairs.filter(expr(p)).queryExecution.optimizedPlan.toString
      assert(s.contains("abs("), s"predicate '$p' not guarded:\n$s")
    }
    // 3-arg thresholded levenshtein is deliberately untouched
    val s3 = pairs.filter(expr("levenshtein(a, b, 3) <= 3"))
      .queryExecution.optimizedPlan.toString
    assert(!s3.contains("abs("))
  }
}
