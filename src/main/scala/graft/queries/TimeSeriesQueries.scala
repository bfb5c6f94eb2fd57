package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Per-entity time-series repair: spine densification and gap filling
  * over the event stream. The reference's time handling stops at
  * extraction predicates (SURVEY §2 P6/P7) and the month spine
  * (`etl/carga_a_BD.py` grain); these queries add the repair step every
  * downstream forecaster needs — a dense per-key calendar with missing
  * points filled deterministically.
  */
object TimeSeriesQueries {

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // LINEAR-INTERPOLATION gap fill per (user, day): densify each
    // user's activity series over its own [min_day, max_day] spine
    // (sequence+explode — never a global calendar cross join), then
    // fill missing days from the bracketing observations with one
    // carry-forward and one carry-backward IGNORE NULLS window:
    // filled = prev + (next − prev) · (Δdays / gap), every operand
    // cast to double in the SAME textual order on both engines (IEEE
    // ± and × are deterministic, so the doubles hash-match). Windows
    // partition by user — bounded per-key state, no global sort; the
    // identical plan runs at any key count.
    "gap_fill_interpolate" -> QueryDef(
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val spine = daily
          .groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
        val wUp = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wDown = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        spine.join(daily, Seq("user_id", "day"), "left")
          .withColumn("pd",
            last(when(col("n").isNotNull, col("day")), ignoreNulls = true)
              .over(wUp))
          .withColumn("pn", last(col("n"), ignoreNulls = true).over(wUp))
          .withColumn("nd",
            first(when(col("n").isNotNull, col("day")), ignoreNulls = true)
              .over(wDown))
          .withColumn("nn", first(col("n"), ignoreNulls = true).over(wDown))
          .select(col("user_id"), col("day"),
            col("n").isNull.as("interpolated"),
            when(col("n").isNotNull, col("n").cast("double"))
              .otherwise(col("pn").cast("double") +
                (col("nn").cast("double") - col("pn").cast("double")) *
                  (datediff(col("day"), col("pd")).cast("double") /
                    datediff(col("nd"), col("pd")).cast("double")))
              .as("n_filled"))
          .orderBy(col("user_id"), col("day"))
      },
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT b.user_id,
        |    CAST(unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds b),
        |j AS (
        |  SELECT s.user_id, s.day, d.n FROM spine s
        |  LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day),
        |w AS (
        |  SELECT user_id, day, n,
        |    last_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |    last_value(n IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pn,
        |    first_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
        |    first_value(n IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nn
        |  FROM j)
        |SELECT user_id, day, n IS NULL AS interpolated,
        |  CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
        |       ELSE CAST(pn AS DOUBLE) + (CAST(nn AS DOUBLE) - CAST(pn AS DOUBLE)) *
        |         (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)) END AS n_filled
        |FROM w ORDER BY user_id, day""".stripMargin),

    // ------------------------------------------------------------------
    // Debounce / throttle (the telemetry-ingest primitive): per
    // customer, an order is KEPT iff it is the customer's first or
    // arrives more than 7 days after the previous order — burst
    // collapse by the gap rule (a new burst starts when the gap
    // exceeds the threshold, the sessionize break rule applied as a
    // filter). One key-partitioned window; day arithmetic stays in
    // exact epoch integers.
    "order_debounce" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("prev_d", lag(col("o_orderdate"), 1).over(w))
          // o_orderdate is TIMESTAMP_NTZ and midnight-aligned, so the
          // 7-day gap rule is exactly a day-grain datediff
          .withColumn("keep",
            when(col("prev_d").isNull ||
              datediff(col("o_orderdate").cast("date"),
                col("prev_d").cast("date")) > 7, lit(1L)).otherwise(lit(0L)))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), sum(col("keep")).as("n_kept"))
          .filter(col("n_orders") > col("n_kept"))
          .orderBy(col("o_custkey"))
      },
      """WITH e AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey,
        |    lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_d
        |  FROM orders),
        |k AS (
        |  SELECT o_custkey,
        |    CASE WHEN prev_d IS NULL
        |           OR date_diff('day', CAST(prev_d AS DATE), CAST(o_orderdate AS DATE)) > 7
        |         THEN 1 ELSE 0 END AS keep
        |  FROM e)
        |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(keep) AS BIGINT) AS n_kept
        |FROM k GROUP BY 1 HAVING count(*) > SUM(keep)
        |ORDER BY o_custkey""".stripMargin),

    // ------------------------------------------------------------------
    // Rolling 30-day Pearson correlation of quantity vs discount: the
    // relationship-drift monitor. Sufficient statistics consolidate to
    // the DAY grain first (exact BIGINTs; discount rides the proven
    // DECIMAL(3,2)·100 integer grid), the RANGE window sums integers
    // only, and each day's correlation is one fixed-order IEEE finish —
    // the rolling window never sees doubles or raw rows.
    "rolling_corr_qty_disc" -> QueryDef(
      (s, dir) => {
        val x = col("l_quantity").cast("long")
        val y = (col("l_discount").cast("decimal(3,2)") * 100).cast("long")
        val d = Tables.lineitem(s, dir)
          .select(col("l_shipdate").cast("date").as("day"),
            x.as("x"), y.as("y"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        val win = Window.orderBy(col("day").cast("timestamp").cast("long"))
          .rangeBetween(-29L * 86400L, 0L)
        val w = d.select(col("day"),
          sum(col("n")).over(win).as("n"),
          sum(col("sx")).over(win).as("sx"),
          sum(col("sy")).over(win).as("sy"),
          sum(col("sxy")).over(win).as("sxy"),
          sum(col("sxx")).over(win).as("sxx"),
          sum(col("syy")).over(win).as("syy"))
        w.filter(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("n") * col("syy") - col("sy") * col("sy") > 0)
          .select(col("day"), col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
              .as("corr30"))
          .orderBy(col("day"))
          .limit(100)
      },
      """WITH d AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(SUM(CAST(CAST(l_discount AS DECIMAL(3,2)) * 100 AS BIGINT)) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(CAST(l_discount AS DECIMAL(3,2)) * 100 AS BIGINT)) AS BIGINT) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
        |    CAST(SUM(CAST(CAST(l_discount AS DECIMAL(3,2)) * 100 AS BIGINT) * CAST(CAST(l_discount AS DECIMAL(3,2)) * 100 AS BIGINT)) AS BIGINT) AS syy
        |  FROM lineitem GROUP BY 1),
        |w AS (
        |  SELECT day,
        |    CAST(SUM(n) OVER win AS BIGINT) AS n,
        |    CAST(SUM(sx) OVER win AS BIGINT) AS sx,
        |    CAST(SUM(sy) OVER win AS BIGINT) AS sy,
        |    CAST(SUM(sxy) OVER win AS BIGINT) AS sxy,
        |    CAST(SUM(sxx) OVER win AS BIGINT) AS sxx,
        |    CAST(SUM(syy) OVER win AS BIGINT) AS syy
        |  FROM d
        |  WINDOW win AS (ORDER BY day RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW))
        |SELECT day, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr30
        |FROM w WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |ORDER BY day LIMIT 100""".stripMargin),

    // ------------------------------------------------------------------
    // Difference-in-differences (the two-group × two-period causal
    // baseline): BUILDING-segment customers as the treated group,
    // 1997 → 1998 as pre/post, mean order value (exact cents) as the
    // outcome. Four exact (sum, count) cells from ONE pass over the
    // date-pruned join; each mean is one division and the DiD estimate
    // is one fixed-order expression on the 1-row cell frame.
    "diff_in_diff_price" -> QueryDef(
      (s, dir) => {
        val j = Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"))
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
          .select(
            when(col("c_mktsegment") === "BUILDING", lit(1)).otherwise(lit(0))
              .as("treated"),
            when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"),
              lit(1)).otherwise(lit(0)).as("post"),
            (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
              .as("cents"))
        val g = j.groupBy(col("treated"), col("post"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        def cell(t: Int, p: Int) = max(when(col("treated") === t && col("post") === p,
          col("s").cast("double") / col("n").cast("double")))
        g.agg(
            cell(1, 0).as("t0"), cell(1, 1).as("t1"),
            cell(0, 0).as("c0"), cell(0, 1).as("c1"))
          .select(col("t0"), col("t1"), col("c0"), col("c1"),
            ((col("t1") - col("t0")) - (col("c1") - col("c0"))).as("did_cents"))
      },
      """WITH j AS (
        |  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treated,
        |    CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS post,
        |    CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1999-01-01'),
        |g AS (
        |  SELECT treated, post, CAST(count(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
        |  FROM j GROUP BY 1, 2),
        |p AS (
        |  SELECT
        |    max(CASE WHEN treated = 1 AND post = 0 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS t0,
        |    max(CASE WHEN treated = 1 AND post = 1 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS t1,
        |    max(CASE WHEN treated = 0 AND post = 0 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS c0,
        |    max(CASE WHEN treated = 0 AND post = 1 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS c1
        |  FROM g)
        |SELECT t0, t1, c0, c1, (t1 - t0) - (c1 - c0) AS did_cents FROM p""".stripMargin),

    // ------------------------------------------------------------------
    // Top session paths (the Sankey/user-journey rollup): sessionize by
    // the proven 30-minute break rule, take each session's first three
    // event types in arrival order, count path strings. The path
    // concat folds an already-bounded (≤3-row) sorted list per session;
    // everything heavier is the one user-partitioned window the
    // sessionizer already needs.
    "top_session_paths" -> QueryDef(
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val sess = Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("brk",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
                1800L * 1000000L, 1L).otherwise(0L))
          .withColumn("sess", sum(col("brk")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val bySess = Window.partitionBy(col("user_id"), col("sess"))
          .orderBy(col("ts"), col("event_id"))
        sess.withColumn("rn", row_number().over(bySess))
          .filter(col("rn") <= 3)
          .groupBy(col("user_id"), col("sess"))
          .agg(array_join(
            transform(sort_array(collect_list(struct(col("rn"), col("event_type")))),
              x => x.getField("event_type")), ">").as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(15)
      },
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CAST(SUM(CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
        |                  THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
        |  FROM e),
        |r AS (
        |  SELECT user_id, sess, event_type,
        |    row_number() OVER (PARTITION BY user_id, sess ORDER BY ts, event_id) AS rn
        |  FROM s),
        |p AS (
        |  SELECT user_id, sess,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 15""".stripMargin),

    // ------------------------------------------------------------------
    // Seasonal-naive forecast backtest (forecast(d) = actual(d−7)),
    // scored as per-weekday MAE — the baseline every demand forecaster
    // must beat, and the forecastability probe for a new series. The
    // day-grain consolidation is the only fact-table agg; the lag join
    // is a self equi-join on the day key; absolute errors stay integer
    // until one division per weekday.
    // ------------------------------------------------------------------
    // Mann–Kendall trend test (Mann 1945; Kendall 1975) over the 1996
    // daily order-count series — the standard nonparametric "is this
    // metric drifting" monitor (no distributional assumption, robust
    // to outliers): S = Σ_{i<j} sign(y_j − y_i), tie-corrected
    // variance kept as the exact INTEGER numerator
    // var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and the continuity-
    // corrected z = (S∓1)/sqrt(var18/18) — one division and one
    // correctly-rounded sqrt. Consolidate-to-day-grain-first (366
    // rows), then the bounded pairwise self-join (~67k pairs at any
    // SF).
    "mann_kendall_trend" -> QueryDef(
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("y"))
          .localCheckpoint() // feeds the pair join (both sides) + ties + n
        val pairs = daily.select(col("d").as("di"), col("y").as("yi"))
          .join(daily.select(col("d").as("dj"), col("y").as("yj")),
            col("di") < col("dj"))
          .agg(sum(signum(col("yj") - col("yi")).cast("long")).as("s_stat"),
            count(lit(1)).as("n_pairs"))
        val ties = daily.groupBy(col("y")).agg(count(lit(1)).as("t"))
          .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
            .as("tie18"))
        val nn = daily.agg(count(lit(1)).as("n"))
        pairs.crossJoin(broadcast(nn)).crossJoin(broadcast(ties))
          .select(col("n"), col("n_pairs"), col("s_stat"),
            (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
              coalesce(col("tie18"), lit(0L))).as("var18"))
          .withColumn("z",
            when(col("var18") > 0,
              when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
                .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
                .otherwise(lit(0.0)) /
                sqrt(col("var18").cast("double") / lit(18.0)))
              .otherwise(lit(0.0)))
      },
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |pr AS (
        |  SELECT CAST(SUM(CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT) AS s_stat,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |ties AS (
        |  SELECT CAST(coalesce(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie18
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY y)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
        |SELECT nn.n, pr.n_pairs, pr.s_stat,
        |  nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie18 AS var18,
        |  CASE WHEN nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie18 > 0
        |       THEN (CASE WHEN pr.s_stat > 0 THEN CAST(pr.s_stat - 1 AS DOUBLE)
        |                  WHEN pr.s_stat < 0 THEN CAST(pr.s_stat + 1 AS DOUBLE)
        |                  ELSE CAST(0.0 AS DOUBLE) END)
        |            / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie18 AS DOUBLE) / CAST(18.0 AS DOUBLE))
        |       ELSE CAST(0.0 AS DOUBLE) END AS z
        |FROM pr CROSS JOIN nn CROSS JOIN ties""".stripMargin),

    // ------------------------------------------------------------------
    // Theil–Sen robust slope (Theil 1950; Sen 1968) over the same
    // series: the LOWER median of all pairwise slopes
    // (y_j−y_i)/(day_j−day_i) — each slope ONE IEEE division over
    // exact integers, the median an exact rank-(⌈m/2⌉) selection
    // under the total (slope, di, dj) order (deterministic across
    // engines: identical division bits, identical tiebreak). The
    // robust-regression complement to OLS (ols_qty_on_discount):
    // immune to outlier days. Intercept = lower median of
    // y_i − slope·day_i under (value, d) order.
    "theil_sen_slope" -> QueryDef(
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(datediff(col("o_orderdate").cast("date"),
            lit("1996-01-01").cast("date")).cast("long").as("x"))
          .agg(count(lit(1)).as("y"))
          .localCheckpoint() // feeds both pair sides + the intercept pass
        val slopes = daily.select(col("x").as("xi"), col("y").as("yi"))
          .join(daily.select(col("x").as("xj"), col("y").as("yj")),
            col("xi") < col("xj"))
          .select(col("xi"), col("xj"),
            ((col("yj") - col("yi")).cast("double") /
              (col("xj") - col("xi")).cast("double")).as("slope"))
          .localCheckpoint() // feeds the count agg AND the rank selection
        val m = slopes.agg(count(lit(1)).as("m"))
        val w = Window.orderBy(col("slope"), col("xi"), col("xj"))
        val med = slopes
          .withColumn("rk", row_number().over(w))
          .crossJoin(broadcast(m))
          .filter(col("rk") === expr("(m + 1) div 2"))
          .select(col("m").as("n_pairs"), col("slope"))
        val wi = Window.orderBy(col("v"), col("x"))
        med.crossJoin(daily)
          .select(col("n_pairs"), col("slope"), col("x"),
            (col("y").cast("double") -
              col("slope") * col("x").cast("double")).as("v"))
          .withColumn("rk", row_number().over(wi))
          .crossJoin(broadcast(daily.agg(count(lit(1)).as("nd"))))
          .filter(col("rk") === expr("(nd + 1) div 2"))
          .select(col("n_pairs"), col("nd").as("n_days"), col("slope"),
            col("v").as("intercept"))
      },
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |sl AS (
        |  SELECT a.x AS xi, b.x AS xj,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON a.x < b.x),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM sl),
        |med AS (
        |  SELECT mm.m AS n_pairs, t.slope
        |  FROM (SELECT slope, row_number() OVER (ORDER BY slope, xi, xj) AS rk FROM sl) t
        |  CROSS JOIN mm WHERE t.rk = (mm.m + 1) // 2),
        |iv AS (
        |  SELECT med.n_pairs, med.slope, d.x,
        |    CAST(d.y AS DOUBLE) - med.slope * CAST(d.x AS DOUBLE) AS v
        |  FROM med CROSS JOIN daily d),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily)
        |SELECT t.n_pairs, nd.nd AS n_days, t.slope, t.v AS intercept
        |FROM (SELECT n_pairs, slope, v,
        |        row_number() OVER (ORDER BY v, x) AS rk FROM iv) t
        |CROSS JOIN nd WHERE t.rk = (nd.nd + 1) // 2""".stripMargin),

    // ------------------------------------------------------------------
    // Split CONFORMAL prediction interval (Vovk et al.; the
    // distribution-free UQ recipe) around the lag-7 seasonal-naive
    // forecaster: calibration residuals |y − y_lag7| on 1996 H1 (exact
    // integers), the interval half-width q̂ is the rank-
    // ⌈(n+1)(1−α)⌉ calibration residual (α = 0.1 — the rank computed
    // in exact integer arithmetic, the selection under a (r, day)
    // total order), and H2 coverage = the fraction of test days whose
    // residual ≤ q̂ — ONE division. The finite-sample ≥ 1−α coverage
    // guarantee is what makes this the production forecast-gate; every
    // step is engine-exact.
    "conformal_forecast_interval" -> QueryDef(
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("y"))
          .localCheckpoint() // feeds both sides of the lag join
        val res = daily
          .join(daily.select(date_add(col("d"), 7).as("d"),
            col("y").as("y_hat")), Seq("d"))
          .select(col("d"), abs(col("y") - col("y_hat")).as("r"))
          .localCheckpoint() // feeds the calibration rank AND the test scan
        val cal = res.filter(col("d") < lit("1996-07-01").cast("date"))
        val nCal = cal.agg(count(lit(1)).as("n_cal"))
        val w = Window.orderBy(col("r"), col("d"))
        val qhat = cal.withColumn("rk", row_number().over(w))
          .crossJoin(broadcast(nCal))
          .filter(col("rk") === expr("(9 * (n_cal + 1) + 9) div 10"))
          .select(col("n_cal"), col("rk").cast("long").as("k_rank"),
            col("r").as("qhat"))
        res.filter(col("d") >= lit("1996-07-01").cast("date"))
          .crossJoin(broadcast(qhat))
          .agg(
            first(col("n_cal")).as("n_cal"),
            first(col("k_rank")).as("k_rank"),
            first(col("qhat")).as("qhat"),
            count(lit(1)).as("n_test"),
            sum(when(col("r") <= col("qhat"), 1L).otherwise(0L))
              .as("n_covered"))
          .withColumn("coverage",
            col("n_covered").cast("double") / col("n_test").cast("double"))
      },
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |res AS (
        |  SELECT a.d, CAST(abs(a.y - b.y) AS BIGINT) AS r
        |  FROM daily a JOIN daily b ON b.d + INTERVAL 7 DAY = a.d),
        |cal AS (SELECT * FROM res WHERE d < DATE '1996-07-01'),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
        |qh AS (
        |  SELECT nc.n_cal, t.rk AS k_rank, t.r AS qhat
        |  FROM (SELECT r, row_number() OVER (ORDER BY r, d) AS rk FROM cal) t
        |  CROSS JOIN nc WHERE t.rk = (9 * (nc.n_cal + 1) + 9) // 10),
        |tst AS (SELECT * FROM res WHERE d >= DATE '1996-07-01')
        |SELECT qh.n_cal, qh.k_rank, qh.qhat,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN tst.r <= qh.qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  CAST(SUM(CASE WHEN tst.r <= qh.qhat THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS coverage
        |FROM tst CROSS JOIN qh
        |GROUP BY 1, 2, 3""".stripMargin),

    // ------------------------------------------------------------------
    // MONDRIAN (group-conditional) conformal coverage: the split-
    // conformal recipe above run PER URGENCY CLASS
    // (urgent = 1-URGENT/2-HIGH vs the rest — priority-level groups
    // are too sparse to seat the rank at sf0.001) — each group
    // gets its own calibration residuals, its own exact rank-
    // ⌈(n_g+1)(1−α)⌉ q̂, and its own test coverage, so the ≥ 1−α
    // guarantee holds WITHIN every class, not just marginally (the
    // fairness-grade UQ contract; Vovk's Mondrian taxonomy). Same
    // exact-integer machinery, with the rank selection under a
    // PARTITION BY group window; groups whose calibration can't seat
    // the rank drop from both engines identically.
    "conformal_group_coverage" -> QueryDef(
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hi")
              .otherwise("lo").as("p"),
            col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("y"))
          .localCheckpoint() // feeds both sides of the per-group lag join
        val res = daily
          .join(daily.select(col("p"), date_add(col("d"), 7).as("d"),
            col("y").as("y_hat")), Seq("p", "d"))
          .select(col("p"), col("d"), abs(col("y") - col("y_hat")).as("r"))
          .localCheckpoint() // feeds the calibration ranks AND the test scan
        val cal = res.filter(col("d") < lit("1996-07-01").cast("date"))
        val nCal = cal.groupBy(col("p")).agg(count(lit(1)).as("n_cal"))
        val w = Window.partitionBy(col("p")).orderBy(col("r"), col("d"))
        val qhat = cal.withColumn("rk", row_number().over(w))
          .join(broadcast(nCal), Seq("p"))
          .filter(col("rk") === expr("(9 * (n_cal + 1) + 9) div 10"))
          .select(col("p"), col("n_cal"), col("rk").cast("long").as("k_rank"),
            col("r").as("qhat"))
        res.filter(col("d") >= lit("1996-07-01").cast("date"))
          .join(broadcast(qhat), Seq("p"))
          .groupBy(col("p"), col("n_cal"), col("k_rank"), col("qhat"))
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("r") <= col("qhat"), 1L).otherwise(0L)).as("n_covered"))
          .withColumn("coverage",
            col("n_covered").cast("double") / col("n_test").cast("double"))
          .orderBy(col("p"))
      },
      """WITH daily AS (
        |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hi' ELSE 'lo' END AS p,
        |    CAST(o_orderdate AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2),
        |res AS (
        |  SELECT a.p, a.d, CAST(abs(a.y - b.y) AS BIGINT) AS r
        |  FROM daily a JOIN daily b ON b.p = a.p AND b.d + INTERVAL 7 DAY = a.d),
        |cal AS (SELECT * FROM res WHERE d < DATE '1996-07-01'),
        |nc AS (SELECT p, CAST(count(*) AS BIGINT) AS n_cal FROM cal GROUP BY 1),
        |qh AS (
        |  SELECT t.p, nc.n_cal, t.rk AS k_rank, t.r AS qhat
        |  FROM (SELECT p, r, row_number() OVER (PARTITION BY p ORDER BY r, d) AS rk
        |        FROM cal) t
        |  JOIN nc ON nc.p = t.p
        |  WHERE t.rk = (9 * (nc.n_cal + 1) + 9) // 10),
        |tst AS (SELECT * FROM res WHERE d >= DATE '1996-07-01')
        |SELECT tst.p, qh.n_cal, qh.k_rank, qh.qhat,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN tst.r <= qh.qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  CAST(SUM(CASE WHEN tst.r <= qh.qhat THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS coverage
        |FROM tst JOIN qh ON qh.p = tst.p
        |GROUP BY 1, 2, 3, 4
        |ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // Wald–Wolfowitz RUNS test (1940) on the 1996 daily series —
    // "is the day-to-day sequence random around its median, or does it
    // streak?" (the complement to Mann–Kendall: MK sees monotone
    // drift, runs see clustering/oscillation). Dichotomize against the
    // exact LOWER median (rank selection — the Theil–Sen recipe),
    // drop exact-median ties (the standard convention), count runs
    // with one lag window over the bounded day frame; μ_R and σ²_R
    // are single divisions over exact integers and z composes them in
    // identical textual order.
    "runs_test_daily" -> QueryDef(
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("y"))
          .localCheckpoint() // feeds the median rank AND the runs scan
        val nn = daily.agg(count(lit(1)).as("n"))
        val wMed = Window.orderBy(col("y"), col("d"))
        val med = daily.withColumn("rk", row_number().over(wMed))
          .crossJoin(broadcast(nn))
          .filter(col("rk") === expr("(n + 1) div 2"))
          .select(col("y").as("med"))
        val signed = daily.crossJoin(broadcast(med))
          .filter(col("y") =!= col("med"))
          .select(col("d"), when(col("y") > col("med"), 1).otherwise(0).as("sg"))
        val wd = Window.orderBy(col("d"))
        signed
          .withColumn("prev", lag(col("sg"), 1).over(wd))
          .agg(
            sum(col("sg").cast("long")).as("n1"),
            sum(lit(1L) - col("sg")).as("n0"),
            (lit(1L) + sum(when(col("prev").isNotNull &&
              col("sg") =!= col("prev"), 1L).otherwise(0L))).as("r_runs"))
          .withColumn("mu_r",
            lit(1.0) + (lit(2L) * col("n1") * col("n0")).cast("double") /
              (col("n1") + col("n0")).cast("double"))
          .withColumn("var_r",
            (lit(2L) * col("n1") * col("n0") *
              (lit(2L) * col("n1") * col("n0") - col("n1") - col("n0")))
              .cast("double") /
              ((col("n1") + col("n0")) * (col("n1") + col("n0")) *
                (col("n1") + col("n0") - 1)).cast("double"))
          .withColumn("z",
            when(col("var_r") > 0,
              (col("r_runs").cast("double") - col("mu_r")) / sqrt(col("var_r")))
              .otherwise(lit(0.0)))
      },
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |med AS (
        |  SELECT t.y AS med
        |  FROM (SELECT y, row_number() OVER (ORDER BY y, d) AS rk FROM daily) t
        |  CROSS JOIN nn WHERE t.rk = (nn.n + 1) // 2),
        |sg AS (
        |  SELECT d, CASE WHEN y > med.med THEN 1 ELSE 0 END AS sg
        |  FROM daily CROSS JOIN med WHERE y <> med.med),
        |st AS (
        |  SELECT CAST(SUM(sg) AS BIGINT) AS n1,
        |    CAST(SUM(1 - sg) AS BIGINT) AS n0,
        |    CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sg <> prev THEN 1 ELSE 0 END) AS BIGINT) AS r_runs
        |  FROM (SELECT sg, lag(sg) OVER (ORDER BY d) AS prev FROM sg)),
        |ext AS (
        |  SELECT n1, n0, r_runs,
        |    CAST(1.0 AS DOUBLE) + CAST(2 * n1 * n0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE) AS mu_r,
        |    CAST(2 * n1 * n0 * (2 * n1 * n0 - n1 - n0) AS DOUBLE) /
        |      CAST((n1 + n0) * (n1 + n0) * (n1 + n0 - 1) AS DOUBLE) AS var_r
        |  FROM st)
        |SELECT n1, n0, r_runs, mu_r, var_r,
        |  CASE WHEN var_r > 0
        |       THEN (CAST(r_runs AS DOUBLE) - mu_r) / sqrt(var_r)
        |       ELSE CAST(0.0 AS DOUBLE) END AS z
        |FROM ext""".stripMargin),

    "seasonal_naive_backtest" -> QueryDef(
      (s, dir) => {
        val d = Tables.orders(s, dir)
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(count(lit(1)).as("n"))
        val j = d.as("a")
          .join(d.select(date_add(col("day"), 7).as("day"),
            col("n").as("fc")), Seq("day"))
          .select(col("day"), abs(col("n") - col("fc")).as("ae"))
        j.groupBy(dayofweek(col("day")).cast("long").as("dow"))
          .agg(count(lit(1)).as("n_days"), sum(col("ae")).as("sum_ae"))
          .select(col("dow"), col("n_days"), col("sum_ae"),
            (col("sum_ae").cast("double") / col("n_days").cast("double"))
              .as("mae"))
          .orderBy(col("dow"))
      },
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT a.day, CAST(abs(a.n - b.n) AS BIGINT) AS ae
        |  FROM d a JOIN d b ON b.day = a.day - INTERVAL 7 DAY),
        |wd AS (
        |  -- DuckDB dayofweek is 0=Sunday; Spark's is 1=Sunday — shift to match
        |  SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
        |    CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(SUM(ae) AS BIGINT) AS sum_ae
        |  FROM j GROUP BY 1)
        |SELECT dow, n_days, sum_ae,
        |  CAST(sum_ae AS DOUBLE) / CAST(n_days AS DOUBLE) AS mae
        |FROM wd ORDER BY dow""".stripMargin),

    // ------------------------------------------------------------------
    // Hodges–Lehmann location + MAD scale (the robust-estimator pair
    // beside Theil–Sen's robust slope): HL = median of the Walsh
    // averages (pairwise means, i ≤ j) of the 1997 daily quantity
    // totals; MAD = median absolute deviation around the exact lower
    // median. Day-grain-first (the mann_kendall rule): the pairwise
    // product and every rank selection run on the bounded ≤366-row
    // statistic frame, never the fact. All exact integers — Walsh
    // sums stay doubled (v_i + v_j) so the lower-median selection is
    // integral; hl_location is the one single division. Global-order
    // windows are the documented bounded-frame exception (≤67k Walsh
    // rows at any SF).
    "hodges_lehmann_mad" -> QueryDef(
      (s, dir) => {
        import graft.functions.TimePred
        val day = Tables.lineitem(s, dir)
          .filter(TimePred.inYear(col("l_shipdate"), 1997))
          .groupBy(col("l_shipdate").cast("date").as("d"))
          .agg(sum(col("l_quantity").cast("long")).as("v"))
          .localCheckpoint() // feeds both Walsh sides, the median, the MAD
        val nDays = day.count()
        val walsh = day.as("a").join(day.as("b"), col("a.d") <= col("b.d"))
          .select((col("a.v") + col("b.v")).as("w2"))
          .localCheckpoint() // feeds the count AND the rank selection
        val m = walsh.count()
        val hl = walsh
          .withColumn("r", row_number().over(Window.orderBy(col("w2"))))
          .filter(col("r") === (m + 1) / 2)
          .select(col("w2").as("hl2"))
        val med = day
          .withColumn("r", row_number().over(Window.orderBy(col("v"))))
          .filter(col("r") === (nDays + 1) / 2)
          .select(col("v").as("median_v"))
          .localCheckpoint() // feeds the output row AND the MAD deviations
        val mad = day.crossJoin(broadcast(med))
          .select(abs(col("v") - col("median_v")).as("ad"))
          .withColumn("r", row_number().over(Window.orderBy(col("ad"))))
          .filter(col("r") === (nDays + 1) / 2)
          .select(col("ad").as("mad_v"))
        hl.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
          .select(
            lit(nDays).as("n_days"), lit(m).as("n_walsh"), col("hl2"),
            (col("hl2").cast("double") / lit(2.0)).as("hl_location"),
            col("median_v"), col("mad_v"))
      },
      """WITH day AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1),
        |walsh AS (SELECT a.v + b.v AS w2 FROM day a JOIN day b ON a.d <= b.d),
        |wn AS (SELECT CAST(count(*) AS BIGINT) AS m FROM walsh),
        |hl AS (
        |  SELECT w2 FROM (SELECT w2, row_number() OVER (ORDER BY w2) AS r FROM walsh)
        |  CROSS JOIN wn WHERE r = (m + 1) // 2),
        |med AS (
        |  SELECT v FROM (SELECT v, row_number() OVER (ORDER BY v) AS r FROM day)
        |  WHERE r = (SELECT (count(*) + 1) // 2 FROM day)),
        |mad AS (
        |  SELECT ad FROM (
        |    SELECT abs(day.v - med.v) AS ad,
        |      row_number() OVER (ORDER BY abs(day.v - med.v)) AS r
        |    FROM day CROSS JOIN med)
        |  WHERE r = (SELECT (count(*) + 1) // 2 FROM day))
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM day) AS n_days,
        |  (SELECT m FROM wn) AS n_walsh,
        |  (SELECT CAST(w2 AS BIGINT) FROM hl) AS hl2,
        |  CAST((SELECT w2 FROM hl) AS DOUBLE) / 2.0 AS hl_location,
        |  (SELECT CAST(v AS BIGINT) FROM med) AS median_v,
        |  (SELECT CAST(ad AS BIGINT) FROM mad) AS mad_v""".stripMargin),

    // ------------------------------------------------------------------
    // ROBUST outlier days via the MAD rule (|v − median| > 3·MAD —
    // the estimator pair hodges_lehmann_mad computes, applied as a
    // GATE): immune to the outliers it hunts, unlike z-scores whose
    // mean/stddev the outliers themselves drag. Day-grain first; the
    // median and MAD ride 1-row broadcasts onto the bounded day frame;
    // the comparison is pure integers (3·MAD exact).
    "mad_outlier_days" -> QueryDef(
      (s, dir) => {
        import graft.functions.TimePred
        val day = Tables.lineitem(s, dir)
          .filter(TimePred.inYear(col("l_shipdate"), 1997))
          .groupBy(col("l_shipdate").cast("date").as("d"))
          .agg(sum(col("l_quantity").cast("long")).as("v"))
          .localCheckpoint() // feeds the median, the MAD, and the gate scan
        val nDays = day.count()
        val med = day
          .withColumn("r", row_number().over(Window.orderBy(col("v"))))
          .filter(col("r") === (nDays + 1) / 2)
          .select(col("v").as("median_v"))
          .localCheckpoint() // feeds the MAD deviations AND the gate
        val mad = day.crossJoin(broadcast(med))
          .select(abs(col("v") - col("median_v")).as("ad"))
          .withColumn("r", row_number().over(Window.orderBy(col("ad"))))
          .filter(col("r") === (nDays + 1) / 2)
          .select(col("ad").as("mad_v"))
        day.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
          .filter(abs(col("v") - col("median_v")) > lit(3L) * col("mad_v"))
          .select(col("d"), col("v"), col("median_v"), col("mad_v"),
            abs(col("v") - col("median_v")).as("abs_dev"))
          .orderBy(col("d"))
      },
      """WITH day AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1),
        |med AS (
        |  SELECT v AS median_v FROM (
        |    SELECT v, row_number() OVER (ORDER BY v) AS r FROM day)
        |  WHERE r = (SELECT (count(*) + 1) // 2 FROM day)),
        |mad AS (
        |  SELECT ad AS mad_v FROM (
        |    SELECT abs(day.v - med.median_v) AS ad,
        |      row_number() OVER (ORDER BY abs(day.v - med.median_v)) AS r
        |    FROM day CROSS JOIN med)
        |  WHERE r = (SELECT (count(*) + 1) // 2 FROM day))
        |SELECT day.d, day.v, med.median_v, mad.mad_v,
        |  abs(day.v - med.median_v) AS abs_dev
        |FROM day CROSS JOIN med CROSS JOIN mad
        |WHERE abs(day.v - med.median_v) > 3 * mad.mad_v
        |ORDER BY day.d""".stripMargin),

    // ------------------------------------------------------------------
    // 10%-TRIMMED MEAN of the 1997 daily totals beside the plain mean
    // — the robust location estimate that tolerates up to 10% junk
    // days per tail: drop the ⌊n/10⌋ lowest- and highest-ranked days
    // (exact rank cutoffs under the total (v, d) order), average the
    // middle — integer sums to ONE division each. Day-grain first;
    // the global-order window is the documented bounded-frame
    // exception.
    "trimmed_mean_daily" -> QueryDef(
      (s, dir) => {
        import graft.functions.TimePred
        val day = Tables.lineitem(s, dir)
          .filter(TimePred.inYear(col("l_shipdate"), 1997))
          .groupBy(col("l_shipdate").cast("date").as("d"))
          .agg(sum(col("l_quantity").cast("long")).as("v"))
          .localCheckpoint() // feeds the rank scan AND the full-mean agg
        val n = day.count()
        val t = n / 10
        val kept = day
          .withColumn("r", row_number().over(Window.orderBy(col("v"), col("d"))))
          .filter(col("r") > t && col("r") <= n - t)
          .agg(count(lit(1)).as("n_kept"), sum(col("v")).as("kept_total"))
        val full = day.agg(sum(col("v")).as("full_total"))
        kept.crossJoin(broadcast(full))
          .select(lit(n).as("n_days"), col("n_kept"), col("kept_total"),
            (col("kept_total").cast("double") / col("n_kept").cast("double"))
              .as("trimmed_mean"),
            (col("full_total").cast("double") / lit(n.toDouble)).as("mean"))
      },
      """WITH day AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(*) // 10 AS BIGINT) AS t FROM day),
        |kept AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_kept,
        |    CAST(SUM(v) AS BIGINT) AS kept_total
        |  FROM (SELECT v, row_number() OVER (ORDER BY v, d) AS r FROM day)
        |  CROSS JOIN nn WHERE r > t AND r <= n - t),
        |fl AS (SELECT CAST(SUM(v) AS BIGINT) AS full_total FROM day)
        |SELECT nn.n AS n_days, kept.n_kept, kept.kept_total,
        |  CAST(kept.kept_total AS DOUBLE) / CAST(kept.n_kept AS DOUBLE) AS trimmed_mean,
        |  CAST(fl.full_total AS DOUBLE) / CAST(nn.n AS DOUBLE) AS mean
        |FROM kept CROSS JOIN fl CROSS JOIN nn""".stripMargin),

    // ------------------------------------------------------------------
    // OVERDISPERSION index per event type (variance-to-mean ratio of
    // daily counts — Poisson ⇒ D ≈ 1, bursty/clustered arrivals ⇒
    // D > 1): the model-selection check run before fitting count
    // models or alerting on rate drift. Exact BIGINT moments on the
    // bounded day grain; D = (n·Σx² − (Σx)²)/n/Σx — two single
    // divisions in identical textual order.
    "overdispersion_events" -> QueryDef(
      (s, dir) => {
        val dc = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
        dc.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"), col("sx"), col("sxx"),
            ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
              col("n").cast("double") / col("sx").cast("double"))
              .as("dispersion"))
          .orderBy(col("event_type"))
      },
      """WITH dc AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x*x) AS BIGINT) AS sxx
        |  FROM dc GROUP BY 1)
        |SELECT event_type, n, sx, sxx,
        |  CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n AS DOUBLE) / CAST(sx AS DOUBLE) AS dispersion
        |FROM m ORDER BY event_type""".stripMargin),

    // ------------------------------------------------------------------
    // CHANGEPOINT by binary segmentation (one split — the greedy seed
    // of the full CUSUM/BinSeg family): the split maximizing the SSE
    // reduction Δ(k) = (n·S₁ − k·S)² / (n·k·(n−k)) over the 1997
    // daily totals. Prefix sums from exact integers on the bounded
    // day frame (global-order window: the documented bounded
    // exception); every Δ is one division of exact-integer products
    // below 2^63, so the argmax compares identical doubles on both
    // engines. Complements cusum_drift_orders, which assumes a KNOWN
    // reference level — this finds the level shift.
    "changepoint_binary_seg" -> QueryDef(
      (s, dir) => {
        import graft.functions.TimePred
        val day = Tables.lineitem(s, dir)
          .filter(TimePred.inYear(col("l_shipdate"), 1997))
          .groupBy(col("l_shipdate").cast("date").as("d"))
          .agg(sum(col("l_quantity").cast("long")).as("v"))
        val w = Window.orderBy(col("d"))
        val n = day.count()
        val tot = day.agg(sum(col("v"))).head().getLong(0)
        val o = day.select(col("d"),
          row_number().over(w).cast("long").as("k"),
          sum(col("v")).over(w).as("s1"))
        o.filter(col("k") < n)
          .select(col("d").as("split_day"), col("k").as("n1"),
            (lit(n) - col("k")).as("n2"), col("s1"),
            (lit(tot) - col("s1")).as("s2"),
            (((lit(n) * col("s1") - col("k") * lit(tot)) *
              (lit(n) * col("s1") - col("k") * lit(tot))).cast("double") /
              (lit(n) * col("k") * (lit(n) - col("k"))).cast("double"))
              .as("delta"))
          .withColumn("mean_left",
            col("s1").cast("double") / col("n1").cast("double"))
          .withColumn("mean_right",
            col("s2").cast("double") / col("n2").cast("double"))
          .orderBy(col("delta").desc, col("split_day"))
          .limit(1)
      },
      """WITH day AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1),
        |o AS (
        |  SELECT d, v,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k,
        |    CAST(SUM(v) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s1,
        |    CAST(count(*) OVER () AS BIGINT) AS n,
        |    CAST(SUM(v) OVER () AS BIGINT) AS s
        |  FROM day),
        |sc AS (
        |  SELECT d, k, s1, n - k AS n2, s - s1 AS s2, n, s,
        |    CAST((n * s1 - k * s) * (n * s1 - k * s) AS DOUBLE)
        |      / CAST(n * k * (n - k) AS DOUBLE) AS delta
        |  FROM o WHERE k < n)
        |SELECT d AS split_day, k AS n1, n2, s1, s2, delta,
        |  CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS mean_left,
        |  CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean_right
        |FROM sc ORDER BY delta DESC, split_day LIMIT 1""".stripMargin),

    // ------------------------------------------------------------------
    // NEW vs RETURNING daily active users — the growth-accounting
    // split every activity dashboard leads with: a user is NEW on
    // their first-ever active day and RETURNING after. One distinct
    // (user, day) pass + one first-day aggregate + one join, exact
    // integers, bounded by the day grain.
    "new_vs_returning_daily" -> QueryDef(
      (s, dir) => {
        val ud = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
          .localCheckpoint() // feeds the first-day agg AND the day rollup
        val fst = ud.groupBy(col("user_id")).agg(min(col("d")).as("f"))
        ud.join(fst, Seq("user_id"))
          .groupBy(col("d").as("day"))
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("d") === col("f"), 1L).otherwise(0L)).as("n_new"),
            sum(when(col("d") > col("f"), 1L).otherwise(0L)).as("n_returning"))
          .orderBy(col("day"))
      },
      """WITH ud AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d FROM events GROUP BY 1, 2),
        |fst AS (SELECT user_id, min(d) AS f FROM ud GROUP BY 1)
        |SELECT ud.d AS day,
        |  CAST(count(*) AS BIGINT) AS n_active,
        |  CAST(SUM(CASE WHEN ud.d = fst.f THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN ud.d > fst.f THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
        |FROM ud JOIN fst USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // PAIRED SIGN TEST, year over year (the distribution-free
    // complement to mcnemar/runs: no normality, no symmetry — only
    // exchangeability of signs under H0): 1996 vs 1997 daily totals
    // paired on (month, day-of-month), counting strict
    // increases/decreases/ties; the test statistic is min(n+, n−) —
    // all exact integers, one inner join on the bounded calendar
    // grain.
    "sign_test_yoy" -> QueryDef(
      (s, dir) => {
        import graft.functions.TimePred
        def yearDay(y: Int) = Tables.lineitem(s, dir)
          .filter(TimePred.inYear(col("l_shipdate"), y))
          .groupBy(month(col("l_shipdate")).as("m"),
            dayofmonth(col("l_shipdate")).as("dd"))
          .agg(sum(col("l_quantity").cast("long")).as("v"))
        val j = yearDay(1996).withColumnRenamed("v", "va")
          .join(yearDay(1997).withColumnRenamed("v", "vb"), Seq("m", "dd"))
        j.agg(count(lit(1)).as("n_pairs"),
            sum(when(col("vb") > col("va"), 1L).otherwise(0L)).as("n_plus"),
            sum(when(col("vb") < col("va"), 1L).otherwise(0L)).as("n_minus"),
            sum(when(col("vb") === col("va"), 1L).otherwise(0L)).as("n_ties"))
          .select(col("n_pairs"), col("n_plus"), col("n_minus"), col("n_ties"),
            least(col("n_plus"), col("n_minus")).as("sign_stat"))
      },
      """WITH a AS (
        |  SELECT month(l_shipdate) AS m, day(l_shipdate) AS dd,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1, 2),
        |b AS (
        |  SELECT month(l_shipdate) AS m, day(l_shipdate) AS dd,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1, 2),
        |j AS (SELECT a.v AS va, b.v AS vb FROM a JOIN b USING (m, dd)),
        |c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN vb > va THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
        |    CAST(SUM(CASE WHEN vb < va THEN 1 ELSE 0 END) AS BIGINT) AS n_minus,
        |    CAST(SUM(CASE WHEN vb = va THEN 1 ELSE 0 END) AS BIGINT) AS n_ties
        |  FROM j)
        |SELECT n_pairs, n_plus, n_minus, n_ties,
        |  CAST(least(n_plus, n_minus) AS BIGINT) AS sign_stat
        |FROM c""".stripMargin),

    // ------------------------------------------------------------------
    // SAX motif discovery (Lin et al. 2003, "A symbolic representation
    // of time series" — public literature) over the daily order-count
    // series: rank-quartile symbols (the empirical-quantile variant —
    // ntile over the deterministic (count, day) total order, so no
    // Gaussian breakpoints/transcendentals), 4-day sliding words via
    // lead(), and motifs = words recurring ≥ 2×. Global windows run on
    // the DAY grain — calendar-bounded (≤ 2,406 rows at any SF), the
    // documented bounded-window exception; everything upstream is one
    // keyed date aggregation. All integers and strings — bit-exact.
    "sax_motifs_daily" -> QueryDef(
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("c"))
        val sym = daily
          .withColumn("q", ntile(4).over(Window.orderBy(col("c"), col("d"))))
          .withColumn("sym", expr("char(96 + q)"))
        val wd = Window.orderBy(col("d"))
        sym
          .withColumn("w", concat(col("sym"),
            lead(col("sym"), 1).over(wd),
            lead(col("sym"), 2).over(wd),
            lead(col("sym"), 3).over(wd)))
          .filter(col("w").isNotNull && length(col("w")) === 4)
          .groupBy(col("w").as("word"))
          .agg(count(lit(1)).as("occurrences"),
            min(col("d")).as("first_day"))
          .filter(col("occurrences") >= 2)
          .orderBy(col("occurrences").desc, col("word"))
      },
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |sym AS (
        |  SELECT d, chr(CAST(96 + ntile(4) OVER (ORDER BY c, d) AS INT)) AS sym,
        |         row_number() OVER (ORDER BY d) AS rn
        |  FROM daily),
        |words AS (
        |  SELECT s1.d AS start_day, s1.sym || s2.sym || s3.sym || s4.sym AS word
        |  FROM sym s1 JOIN sym s2 ON s2.rn = s1.rn + 1
        |  JOIN sym s3 ON s3.rn = s1.rn + 2
        |  JOIN sym s4 ON s4.rn = s1.rn + 3)
        |SELECT word, CAST(count(*) AS BIGINT) AS occurrences,
        |  CAST(min(start_day) AS DATE) AS first_day
        |FROM words GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY occurrences DESC, word""".stripMargin),

    // ------------------------------------------------------------------
    // Holt double exponential smoothing (level + trend) with
    // α = β = 1/2 over the monthly order-count series — the
    // transcendental-free Holt member (general α/β need pow): every
    // update is +,− and a halving in IDENTICAL textual order on both
    // sides, so the recurrence is bit-exact IEEE on both engines.
    // l_t = (y_t + (l + b))/2;  b_t = ((l_t − l) + b)/2;  l₁ = y₁,
    // b₁ = 0. The month grain is calendar-bounded (≤ 84 rows at any
    // SF), so the fold is the exp_smoothing_orders in-expression
    // aggregate over the sorted month list; the oracle is the same
    // chain as a recursive CTE.
    "holt_linear_monthly" -> QueryDef(
      (s, dir) => {
        val m = Tables.orders(s, dir)
          .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("ym"))
          .agg(count(lit(1)).cast("double").as("y"))
        m.agg(sort_array(collect_list(struct(col("ym"), col("y")))).as("xs"))
          .select(explode(expr(
            """slice(aggregate(xs,
              |  array(named_struct('ym', CAST(0 AS BIGINT), 'y', CAST(0.0 AS DOUBLE),
              |    'l', CAST(0.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE))),
              |  (acc, e) -> concat(acc, array(named_struct('ym', e.ym, 'y', e.y,
              |    'l', CASE WHEN size(acc) = 1 THEN e.y
              |              ELSE (e.y + (element_at(acc, -1).l + element_at(acc, -1).b)) / 2 END,
              |    'b', CASE WHEN size(acc) = 1 THEN CAST(0.0 AS DOUBLE)
              |              ELSE (((e.y + (element_at(acc, -1).l + element_at(acc, -1).b)) / 2
              |                     - element_at(acc, -1).l) + element_at(acc, -1).b) / 2 END)))),
              |  2, 100000)""".stripMargin)).as("r"))
          .select(col("r.ym").as("ym"), col("r.y").as("y"),
            col("r.l").as("level"), col("r.b").as("trend"),
            (col("r.l") + col("r.b")).as("forecast_1"))
          .orderBy(col("ym"))
      },
      """WITH m AS (
        |  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS ym,
        |         CAST(count(*) AS DOUBLE) AS y
        |  FROM orders GROUP BY 1),
        |r AS (SELECT ym, y, row_number() OVER (ORDER BY ym) AS rn FROM m),
        |rec AS (
        |  WITH RECURSIVE h(rn, ym, y, l, b) AS (
        |    SELECT rn, ym, y, y, CAST(0.0 AS DOUBLE) FROM r WHERE rn = 1
        |    UNION ALL
        |    SELECT r.rn, r.ym, r.y,
        |           (r.y + (h.l + h.b)) / 2,
        |           (((r.y + (h.l + h.b)) / 2 - h.l) + h.b) / 2
        |    FROM h JOIN r ON r.rn = h.rn + 1)
        |  SELECT * FROM h)
        |SELECT ym, y, l AS level, b AS trend, l + b AS forecast_1
        |FROM rec ORDER BY ym""".stripMargin)
  )
}
