package graft

import org.apache.spark.sql.functions._

/** SargableTimeRewrite: year(d) predicates become pushed-down ranges
  * without changing results — including null and NOT semantics.
  */
class SargableTimeSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def pushed(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.executedPlan
    plan.toString.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
  }

  test("year(date) = Y pushes a range to the parquet scan, same rows") {
    val li = Tables.lineitem(spark, sfDir)
    val viaYear = li.filter(expr("year(l_shipdate) = 1997"))
    // date_format is opaque to the rule — an unrewritten control
    val control = li.filter(date_format($"l_shipdate", "yyyy") === "1997")
    assert(viaYear.count() == control.count())
    assert(viaYear.count() > 0)
    val pf = pushed(viaYear)
    assert(pf.contains("GreaterThanOrEqual(l_shipdate") && pf.contains("LessThan(l_shipdate"),
      s"expected range filters pushed to scan, got: $pf")
  }

  test("inequalities and IN-lists rewrite in both operand orders") {
    val li = Tables.lineitem(spark, sfDir)
    val exp = Map(
      "year(l_shipdate) >= 1997" -> "date_format(l_shipdate, 'yyyy') >= '1997'",
      "year(l_shipdate) > 1997" -> "date_format(l_shipdate, 'yyyy') > '1997'",
      "1997 >= year(l_shipdate)" -> "date_format(l_shipdate, 'yyyy') <= '1997'",
      "year(l_shipdate) < 1995" -> "date_format(l_shipdate, 'yyyy') < '1995'",
      "1995 < year(l_shipdate)" -> "date_format(l_shipdate, 'yyyy') > '1995'",
      "year(l_shipdate) IN (1995, 1997)" -> "date_format(l_shipdate, 'yyyy') IN ('1995','1997')")
    exp.foreach { case (sugar, control) =>
      val a = li.filter(expr(sugar)).count()
      val b = li.filter(expr(control)).count()
      assert(a == b, s"'$sugar': $a != control $b")
      assert(pushed(li.filter(expr(sugar))).contains("l_shipdate"),
        s"'$sugar' did not push down")
    }
  }

  test("timestamp column: year(ts) = Y rewrites with session-tz boundaries") {
    val ev = Tables.events(spark, sfDir)
    val viaYear = ev.filter(expr("year(ts) = 2024"))
    val control = ev.filter(date_format($"ts", "yyyy") === "2024")
    assert(viaYear.count() == control.count())
    assert(viaYear.count() > 0)
  }

  test("null dates: equivalence holds under NOT (three-valued logic)") {
    val df = Seq(Some("1997-05-01"), Some("1998-01-01"), None)
      .toDF("s").select(to_date($"s").as("d"))
    assert(df.filter(expr("year(d) = 1997")).count() == 1)
    // NOT(year(d) = 1997): null rows stay excluded in both forms
    assert(df.filter(expr("NOT (year(d) = 1997)")).count() == 1)
    assert(df.filter(!(year($"d") === 1997)).count() == 1)
  }
}
