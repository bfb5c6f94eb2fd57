package graft

import org.apache.spark.sql.functions._

import graft.plans.{MvDef, MvRewrite}

/** The aggregate navigator: coarser rollups over the fact scan must
  * retarget onto a registered pre-aggregate (plan-asserted), produce
  * identical results, re-state residual key filters on the MV, and
  * fail OPEN (keep the fact plan) for anything non-derivable.
  */
class MvRewriteSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def withMv(test: => Unit): Unit = {
    val mv = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("cnt"),
        min(col("l_quantity").cast("long")).as("min_qty"),
        max(col("l_quantity").cast("long")).as("max_qty"),
        count(col("l_quantity").cast("long")).as("cnt_qty"))
      .localCheckpoint()
    MvRewrite.register(MvDef(
      srcPathTag = "/lineitem",
      keys = Set("l_returnflag", "l_linestatus"),
      sums = Map("l_quantity" -> "sum_qty"),
      countCol = Some("cnt"),
      freshView = () => mv.queryExecution.analyzed,
      mins = Map("l_quantity" -> "min_qty"),
      maxs = Map("l_quantity" -> "max_qty"),
      valueCounts = Map("l_quantity" -> "cnt_qty")))
    try test finally MvRewrite.clear()
  }

  private def factQuery() = Tables.lineitem(spark, dir)
    .groupBy(col("l_returnflag"))
    .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
      count(lit(1)).as("n_lines"))
    .orderBy(col("l_returnflag"))

  test("coarser rollup rewrites onto the MV and matches the fact answer") {
    val expected = factQuery().collect().toSeq // registry empty: fact plan
    withMv {
      val q = factQuery()
      val paths = MvRewrite.scanPaths(q.queryExecution.optimizedPlan)
      assert(!paths.exists(_.contains("/lineitem")),
        s"fact scan survived the rewrite: $paths")
      assert(q.collect().toSeq == expected, "MV rollup must equal the fact rollup")
    }
  }

  test("residual key filter re-states on the MV") {
    val base = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_linestatus"))
    val expected = base.collect().toSeq
    withMv {
      val q = Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_linestatus"))
      assert(!MvRewrite.scanPaths(q.queryExecution.optimizedPlan)
        .exists(_.contains("/lineitem")))
      assert(q.collect().toSeq == expected)
    }
  }

  test("non-derivable outputs veto the rewrite (fail-open)") {
    withMv {
      // uncovered measure
      val q1 = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_extendedprice")).as("s"))
      assert(MvRewrite.scanPaths(q1.queryExecution.optimizedPlan)
        .exists(_.contains("/lineitem")), "uncovered measure must not rewrite")
      // type mismatch: raw double sum vs the MV's long partial
      val q2 = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"))
      assert(MvRewrite.scanPaths(q2.queryExecution.optimizedPlan)
        .exists(_.contains("/lineitem")), "type mismatch must not rewrite")
      // non-key grouping column
      val q3 = Tables.lineitem(spark, dir)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"))
      assert(MvRewrite.scanPaths(q3.queryExecution.optimizedPlan)
        .exists(_.contains("/lineitem")), "non-key grouping must not rewrite")
      // non-key filter column
      val q4 = Tables.lineitem(spark, dir)
        .filter(col("l_quantity") > 10)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
      assert(MvRewrite.scanPaths(q4.queryExecution.optimizedPlan)
        .exists(_.contains("/lineitem")), "non-key filter must not rewrite")
    }
  }

  test("MIN/MAX roll up from partials and AVG derives as sum/valueCount") {
    def q() = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_quantity").cast("long")).as("mn"),
        max(col("l_quantity").cast("long")).as("mx"),
        avg(col("l_quantity").cast("long")).as("av"))
      .orderBy(col("l_returnflag"))
    val expected = q().collect().toSeq // registry empty: fact plan
    withMv {
      val r = q()
      val paths = MvRewrite.scanPaths(r.queryExecution.optimizedPlan)
      assert(!paths.exists(_.contains("/lineitem")),
        s"fact scan survived the min/max/avg rewrite: $paths")
      assert(r.collect().toSeq == expected,
        "MV min/max/avg must equal the fact answer bit-for-bit")
    }
  }

  test("AVG without a registered value-count partial vetoes (fail-open)") {
    val mv = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .localCheckpoint()
    MvRewrite.register(MvDef(
      srcPathTag = "/lineitem",
      keys = Set("l_returnflag", "l_linestatus"),
      sums = Map("l_quantity" -> "sum_qty"),
      countCol = Some("cnt"),
      freshView = () => mv.queryExecution.analyzed))
    try {
      val q = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity").cast("long")).as("av"))
      assert(MvRewrite.scanPaths(q.queryExecution.optimizedPlan)
        .exists(_.contains("/lineitem")),
        "AVG must not rewrite via COUNT(*): nullable measures would " +
          "divide by the wrong denominator")
    } finally MvRewrite.clear()
  }

  test("global COUNT over an MV-emptying residual filter yields 0, not NULL") {
    withMv {
      val q = Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "ZZ") // matches nothing
        .agg(count(lit(1)).as("n"))
      assert(!MvRewrite.scanPaths(q.queryExecution.optimizedPlan)
        .exists(_.contains("/lineitem")), "global count must rewrite")
      val rows = q.collect().toSeq
      assert(rows.size == 1 && !rows.head.isNullAt(0) && rows.head.getLong(0) == 0L,
        s"empty-child global COUNT must be 0 (got $rows)")
    }
  }

  test("exact-grain and global rollups both derive") {
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect().toSeq
    val global = Tables.lineitem(spark, dir)
      .agg(count(lit(1)).as("n")).collect().toSeq
    withMv {
      val qe = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
      val qg = Tables.lineitem(spark, dir).agg(count(lit(1)).as("n"))
      assert(!MvRewrite.scanPaths(qe.queryExecution.optimizedPlan)
        .exists(_.contains("/lineitem")))
      assert(!MvRewrite.scanPaths(qg.queryExecution.optimizedPlan)
        .exists(_.contains("/lineitem")))
      assert(qe.collect().toSeq == exact)
      assert(qg.collect().toSeq == global)
    }
  }
}
