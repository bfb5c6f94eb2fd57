package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** r14 additions: storage-layout operators (bucketed co-located join,
  * schema-evolution read, set ops), intermittent-demand and forecast
  * evaluation (Croston, MASE), association/agreement statistics
  * (Brown–Forsythe, Cramér's V, Kendall τ-b, Brier), and curation
  * analytics (vocabulary growth, capped resource-allocation link
  * prediction). Every query keeps the bit-exact discipline: integer
  * measures, halving-chain folds, fixed-textual-order double
  * expressions, single divisions/sqrt, deterministic total orders.
  */
object EvalOpsQueries {

  private val toksSql =
    "list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), t -> len(t) > 0)"

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // Set operators (INTERSECT / EXCEPT — distinct set semantics on
    // both engines): year-cohort retention of ordering customers.
    // Spark's intersect/except plan as partial-agg'd joins; output is
    // the per-op census so the result stays O(1).
    "intersect_except_cohorts" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_custkey"), year(to_date(col("o_orderdate"))).as("yr"))
        val a = o.filter(col("yr") === 1996).select(col("o_custkey")).distinct()
        val b = o.filter(col("yr") === 1997).select(col("o_custkey")).distinct()
        def stats(op: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n"),
            coalesce(sum(col("o_custkey")), lit(0L)).as("id_sum"))
            .select(lit(op).as("cohort_op"), col("n"), col("id_sum"))
        stats("both", a.intersect(b))
          .unionByName(stats("only_1996", a.except(b)))
          .unionByName(stats("only_1997", b.except(a)))
          .orderBy(col("cohort_op"))
      },
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
        |u AS (
        |  SELECT 'both' AS cohort_op, o_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'only_1996', o_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'only_1997', o_custkey FROM (SELECT * FROM b EXCEPT SELECT * FROM a))
        |SELECT cohort_op, CAST(count(o_custkey) AS BIGINT) AS n,
        |  CAST(coalesce(sum(o_custkey), 0) AS BIGINT) AS id_sum
        |FROM u GROUP BY 1 ORDER BY cohort_op""".stripMargin),

    // ------------------------------------------------------------------
    // Schema-evolution read: two parquet batches written with
    // DIFFERENT schemas (v1 lacks the priority column — the "old
    // producer" era), read back as ONE frame with mergeSchema. The
    // lake-side reality every long-lived pipeline hits; Spark's
    // mergeSchema unions the footers, old rows surface NULL for the
    // new column. The oracle recomputes the same result from the base
    // table (the lake-write queries' convention — oracles never read
    // builder-written files).
    "schema_evolution_read" -> QueryDef(
      (s, dir) => {
        val root =
          s"/tmp/graft_r14_lake/${new java.io.File(dir).getName}/schema_evo"
        val o = Tables.orders(s, dir).select(
          col("o_orderkey"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(20,2)) * 100 AS BIGINT)").as("cents"),
          year(to_date(col("o_orderdate"))).as("yr"),
          col("o_orderpriority"))
        o.filter(col("yr") < 1998)
          .select(col("o_orderkey"), col("cents"))
          .write.mode("overwrite").parquet(s"$root/v1")
        o.filter(col("yr") >= 1998)
          .select(col("o_orderkey"), col("cents"), col("o_orderpriority"))
          .write.mode("overwrite").parquet(s"$root/v2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$root/v1", s"$root/v2")
          .groupBy(coalesce(col("o_orderpriority"), lit("LEGACY")).as("priority"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
          .orderBy(col("priority"))
      },
      """SELECT CASE WHEN year(o_orderdate) >= 1998 THEN o_orderpriority
        |            ELSE 'LEGACY' END AS priority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(20,2)) * 100 AS BIGINT)) AS BIGINT) AS cents_sum
        |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin),

    // ------------------------------------------------------------------
    // Storage-bucketed CO-LOCATED join: both sides written bucketed by
    // the join key into the same bucket count, so the SortMergeJoin
    // runs with NO exchange on either input — the require() asserts
    // it (the mef_star_dpp_prune pattern: plan properties are load-
    // bearing, not hoped-for). This is THE 100 TB fact-to-fact join
    // answer: at 8 buckets per side the fixture proves the mechanism;
    // at 100 TB the same layout makes the daily big join shuffle-free.
    // Broadcast is pinned off during construction (and restored) so
    // the small fixture actually exercises the bucketed path.
    "bucket_join_colocated" -> QueryDef(
      (s, dir) => {
        val tag = new java.io.File(dir).getName.replace('.', '_')
        val tOrders = s"graft_r14_orders_$tag"
        val tLine = s"graft_r14_lineitem_$tag"
        // the in-memory catalog is per-session but the warehouse dirs
        // persist — clear both so a fresh session can re-create
        def reset(t: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS $t")
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles.foreach(rm)
            f.delete(): Unit
          }
          rm(new java.io.File(
            s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + s"/$t"))
        }
        reset(tOrders); reset(tLine)
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(tOrders)
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"),
            expr("CAST(CAST(l_extendedprice AS DECIMAL(20,2)) * 100 AS BIGINT)").as("cents"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tLine)
        val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val j = s.table(tOrders)
            .join(s.table(tLine), col("o_orderkey") === col("l_orderkey"))
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("revenue_cents"))
            .orderBy(col("o_orderpriority"))
          val plan = j.queryExecution.executedPlan.toString
          require(plan.contains("SortMergeJoin") &&
            !plan.contains("Exchange hashpartitioning(o_orderkey") &&
            !plan.contains("Exchange hashpartitioning(l_orderkey"),
            "bucketed join must plan exchange-free on the join keys:\n" + plan)
          j
        } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      },
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(20,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),

    // ------------------------------------------------------------------
    // Croston's method (Croston 1972 — public literature) for
    // INTERMITTENT demand, α = 1/2: the min-custkey customer orders
    // ~monthly-to-yearly, so the daily series is mostly zeros — naive
    // SES smears demand over the gaps; Croston separately smooths
    // demand SIZE z and inter-arrival INTERVAL p on occurrence days
    // only, rate forecast = z/p. α = 1/2 keeps every update a halving
    // (the holt_linear_monthly recipe): z' = (z+d)/2, p' = (p+gap)/2 —
    // dyadic-exact IEEE on both engines, the single z/p division last.
    // The fold runs over the ≤ occurrence-count list (bounded per
    // key); at 100 TB this exact shape runs per-SKU under a groupBy.
    "croston_intermittent" -> QueryDef(
      (s, dir) => {
        val ck = Tables.orders(s, dir).agg(min(col("o_custkey")).as("ck"))
        val occ = Tables.orders(s, dir)
          .join(broadcast(ck), col("o_custkey") === col("ck"))
          .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("demand"))
        // single bounded series (≤ ~50 occurrence days at any SF) —
        // the global window is calendar/customer-bounded by design
        val w = Window.orderBy(col("day"))
        val r = occ
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("gap",
            coalesce(datediff(col("day"), lag(col("day"), 1).over(w)), lit(0))
              .cast("long"))
        r.agg(sort_array(collect_list(struct(
          col("rn"), col("day"), col("demand"), col("gap")))).as("xs"))
          .select(explode(expr(
            """slice(aggregate(xs,
              |  array(named_struct('rn', CAST(0 AS BIGINT), 'day', CAST(NULL AS DATE),
              |    'demand', CAST(0 AS BIGINT), 'gap', CAST(0 AS BIGINT),
              |    'z', CAST(0 AS DOUBLE), 'p', CAST(-1 AS DOUBLE))),
              |  (acc, e) -> concat(acc, array(named_struct(
              |    'rn', e.rn, 'day', e.day, 'demand', e.demand, 'gap', e.gap,
              |    'z', CASE WHEN size(acc) = 1 THEN CAST(e.demand AS DOUBLE)
              |              ELSE (element_at(acc, -1).z + CAST(e.demand AS DOUBLE)) / 2 END,
              |    'p', CASE WHEN size(acc) = 1 THEN CAST(-1 AS DOUBLE)
              |              WHEN size(acc) = 2 THEN CAST(e.gap AS DOUBLE)
              |              ELSE (element_at(acc, -1).p + CAST(e.gap AS DOUBLE)) / 2 END)))),
              |  2, 100000)""".stripMargin)).as("e"))
          .select(col("e.rn").as("k"), col("e.day").as("day"),
            col("e.demand").as("demand"), col("e.gap").as("gap_days"),
            col("e.z").as("level_demand"),
            when(col("e.p") < 0, lit(0.0)).otherwise(col("e.p")).as("level_interval"),
            when(col("e.p") < 0, lit(0.0)).otherwise(col("e.z") / col("e.p"))
              .as("croston_rate"))
          .orderBy(col("k"))
      },
      """WITH RECURSIVE ck AS (SELECT min(o_custkey) AS c FROM orders),
        |occ AS (
        |  SELECT CAST(o.o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS demand
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  CROSS JOIN ck WHERE o.o_custkey = ck.c
        |  GROUP BY 1),
        |r AS (SELECT day, demand, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
        |        CAST(coalesce(day - lag(day) OVER (ORDER BY day), 0) AS BIGINT) AS gap
        |      FROM occ),
        |rec AS (
        |  SELECT rn, day, demand, gap,
        |    CAST(demand AS DOUBLE) AS z, CAST(-1 AS DOUBLE) AS p
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.rn, r.day, r.demand, r.gap,
        |    (rec.z + CAST(r.demand AS DOUBLE)) / 2,
        |    CASE WHEN rec.p < 0 THEN CAST(r.gap AS DOUBLE)
        |         ELSE (rec.p + CAST(r.gap AS DOUBLE)) / 2 END
        |  FROM rec JOIN r ON r.rn = rec.rn + 1)
        |SELECT rn AS k, day, demand, gap AS gap_days,
        |  z AS level_demand,
        |  CASE WHEN p < 0 THEN 0.0 ELSE p END AS level_interval,
        |  CASE WHEN p < 0 THEN 0.0 ELSE z / p END AS croston_rate
        |FROM rec ORDER BY k""".stripMargin),

    // ------------------------------------------------------------------
    // MASE (Hyndman & Koehler 2006 — public literature): one-step
    // seasonal-naive (s = 7) forecast error on the 2001 holdout over
    // the in-sample seasonal-naive MAE. Absolute errors are exact
    // BIGINTs; MASE is a ratio of two single divisions in identical
    // textual order. The scale-free forecast-quality number a demand
    // pipeline tracks per series.
    "mase_forecast_eval" -> QueryDef(
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(count(lit(1)).as("y"))
        val pairs = daily.alias("t")
          .join(daily.alias("p"), expr("p.d = t.d - INTERVAL 7 DAYS"))
          .select(col("t.d").as("d"), col("t.y").as("y"), col("p.y").as("y7"))
        val test = pairs.filter(col("d") >= lit("2001-01-01").cast("date"))
          .agg(count(lit(1)).as("n_test"),
            sum(abs(col("y") - col("y7"))).as("sae_fc"))
        val train = pairs.filter(col("d") < lit("2001-01-01").cast("date"))
          .agg(count(lit(1)).as("n_train"),
            sum(abs(col("y") - col("y7"))).as("sae_naive"))
        test.crossJoin(broadcast(train))
          .select(col("n_test"), col("sae_fc"), col("n_train"), col("sae_naive"),
            ((col("sae_fc").cast("double") / col("n_test")) /
              (col("sae_naive").cast("double") / col("n_train"))).as("mase"))
      },
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT t.d, t.y, p.y AS y7 FROM daily t JOIN daily p ON p.d = t.d - 7),
        |test AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(abs(y - y7)) AS BIGINT) AS sae_fc
        |  FROM pairs WHERE d >= DATE '2001-01-01'),
        |train AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_train,
        |    CAST(sum(abs(y - y7)) AS BIGINT) AS sae_naive
        |  FROM pairs WHERE d < DATE '2001-01-01')
        |SELECT n_test, sae_fc, n_train, sae_naive,
        |  (CAST(sae_fc AS DOUBLE) / n_test) / (CAST(sae_naive AS DOUBLE) / n_train) AS mase
        |FROM test CROSS JOIN train""".stripMargin),

    // ------------------------------------------------------------------
    // Brown–Forsythe homogeneity-of-variance test (Brown & Forsythe
    // 1974 — public literature; the median-centered Levene): absolute
    // deviations from each priority group's exact LOWER median (the
    // runs_test convention) in 10-dollar units — z, Σz, Σz² all exact
    // BIGINTs (units chosen so Σz² stays far under 2⁶³ at sf0.1). The
    // W statistic assembles from the 5 fixed priority groups as ONE
    // pivoted expression in identical textual order on both engines —
    // never a SUM over doubles. num uses Σnⱼ(mⱼ−m)², den uses the
    // identity Σ(z−mⱼ)² = Σz² − Σⱼ Sⱼ²/nⱼ.
    "brown_forsythe_variance" -> QueryDef(
      (s, dir) => {
        val v = Tables.orders(s, dir).select(col("o_orderpriority").as("g"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(20,2)) * 100 AS BIGINT) div 1000").as("x"))
        val wg = Window.partitionBy(col("g")).orderBy(col("x"))
        val med = v
          .withColumn("rn", row_number().over(wg))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("g"), col("x").as("m"))
        val st = v.join(med, Seq("g"))
          .select(col("g"), abs(col("x") - col("m")).as("z"))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("z")).as("s"),
            sum(col("z") * col("z")).as("ss"))
        val gs = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val pivAggs = Seq(
          sum(col("n")).as("n_total"), sum(col("s")).as("s_total"),
          sum(col("ss")).as("ss_total")) ++
          gs.zipWithIndex.flatMap { case (g, i) => Seq(
            max(when(col("g") === g, col("n"))).as(s"n${i + 1}"),
            max(when(col("g") === g, col("s"))).as(s"s${i + 1}")) }
        val piv = st.agg(pivAggs.head, pivAggs.tail: _*)
        val m = col("s_total").cast("double") / col("n_total")
        def mj(i: Int) = col(s"s$i").cast("double") / col(s"n$i")
        val num = (1 to 5).map(i =>
          col(s"n$i") * (mj(i) - m) * (mj(i) - m)).reduceLeft(_ + _)
        val den = col("ss_total").cast("double") - (1 to 5).map(i =>
          col(s"s$i").cast("double") * col(s"s$i").cast("double") / col(s"n$i"))
          .reduceLeft(_ + _)
        piv.select(col("n_total"), col("s_total"), col("ss_total"),
          ((col("n_total") - 5).cast("double") / 4 * (num / den)).as("bf_w"))
      }, {
        val gs = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val pivCols = gs.zipWithIndex.map { case (g, i) =>
          s"""    max(CASE WHEN g = '$g' THEN n END) AS n${i + 1},
             |    max(CASE WHEN g = '$g' THEN s END) AS s${i + 1}""".stripMargin
        }.mkString(",\n")
        val num = (1 to 5).map(i =>
          s"n$i * (CAST(s$i AS DOUBLE) / n$i - CAST(s_total AS DOUBLE) / n_total)" +
            s" * (CAST(s$i AS DOUBLE) / n$i - CAST(s_total AS DOUBLE) / n_total)")
          .mkString(" + ")
        val den = (1 to 5).map(i =>
          s"CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE) / n$i").mkString(" + ")
        s"""WITH v AS (
           |  SELECT o_orderpriority AS g, CAST(CAST(o_totalprice AS DECIMAL(20,2)) * 100 AS BIGINT) // 1000 AS x
           |  FROM orders),
           |med AS (
           |  SELECT g, x AS m FROM (
           |    SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
           |           count(*) OVER (PARTITION BY g) AS n
           |    FROM v) t WHERE rn = (n + 1) // 2),
           |st AS (
           |  SELECT v.g, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(abs(v.x - med.m)) AS BIGINT) AS s,
           |    CAST(sum((v.x - med.m) * (v.x - med.m)) AS BIGINT) AS ss
           |  FROM v JOIN med USING (g) GROUP BY 1),
           |piv AS (
           |  SELECT CAST(sum(n) AS BIGINT) AS n_total, CAST(sum(s) AS BIGINT) AS s_total,
           |    CAST(sum(ss) AS BIGINT) AS ss_total,
           |$pivCols
           |  FROM st)
           |SELECT n_total, s_total, ss_total,
           |  CAST(n_total - 5 AS DOUBLE) / 4 * (($num)
           |    / (CAST(ss_total AS DOUBLE) - ($den))) AS bf_w
           |FROM piv""".stripMargin
      }),

    // ------------------------------------------------------------------
    // Cramér's V association (Cramér 1946 — public literature) between
    // order priority (5 levels) and status (3 levels): the 15 χ²
    // cell terms are each one fixed-order double expression over exact
    // integer (O, r, c, N); the cell SUM rides the deterministic
    // ordered fold (sort_array+aggregate ≡ list ORDER BY+list_reduce —
    // the ndcg recipe), never a shuffle-order SUM over doubles.
    // V = sqrt(χ²/(N·min(r−1,c−1))) — min(4,2)=2 is a literal.
    "cramers_v_association" -> QueryDef(
      (s, dir) => {
        val cells = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority").as("g"), col("o_orderstatus").as("s2"))
          .agg(count(lit(1)).as("o"))
        val tot = cells.agg(sum(col("o")).as("n"))
        val rows = cells.groupBy(col("g")).agg(sum(col("o")).as("r"))
        val cols2 = cells.groupBy(col("s2")).agg(sum(col("o")).as("c"))
        val e = col("r").cast("double") * col("c").cast("double") / col("n")
        val terms = cells.join(rows, Seq("g")).join(cols2, Seq("s2"))
          .crossJoin(broadcast(tot))
          .select(col("g"), col("s2"), col("n"),
            ((col("o").cast("double") - e) * (col("o").cast("double") - e) / e)
              .as("t"))
        terms
          .groupBy(col("n"))
          .agg(sort_array(collect_list(struct(col("g"), col("s2"), col("t"))))
            .as("ts"))
          .select(col("n"),
            aggregate(transform(col("ts"), x => x.getField("t")),
              lit(0.0), (a, x) => a + x).as("chi2"))
          .select(col("n"), col("chi2"),
            sqrt(col("chi2") / (col("n").cast("double") * 2)).as("cramers_v"))
      },
      """WITH cells AS (
        |  SELECT o_orderpriority AS g, o_orderstatus AS s2, CAST(count(*) AS BIGINT) AS o
        |  FROM orders GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |rows_ AS (SELECT g, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |cols_ AS (SELECT s2, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |terms AS (
        |  SELECT cells.g, cells.s2, tot.n,
        |    (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / n)
        |    * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / n)
        |    / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / n) AS t
        |  FROM cells JOIN rows_ USING (g) JOIN cols_ USING (s2) CROSS JOIN tot),
        |chi AS (
        |  SELECT n, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(t ORDER BY g, s2)), (a, b) -> a + b) AS chi2
        |  FROM terms GROUP BY n)
        |SELECT n, chi2, sqrt(chi2 / (CAST(n AS DOUBLE) * 2)) AS cramers_v
        |FROM chi""".stripMargin),

    // ------------------------------------------------------------------
    // Kendall τ-b rank correlation (Kendall 1938 — public literature)
    // between two nation rankings (revenue cents vs distinct order
    // count): the 300 nation pairs are a bounded product (the
    // mann_kendall convention); concordant/discordant/tie counts are
    // exact BIGINTs and τ-b is one division over one sqrt of integer
    // products.
    "kendall_tau_nations" -> QueryDef(
      (s, dir) => {
        val m = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
          .join(Tables.nation(s, dir), col("n_nationkey") === col("c_nationkey"))
          .groupBy(col("n_nationkey").as("nk"))
          .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(20,2)) * 100 AS BIGINT)")).as("rev"),
            countDistinct(col("o_orderkey")).as("cnt"))
        val a = m.alias("a"); val b = m.alias("b")
        val sgn = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
          when(x > y, 1).when(x < y, -1).otherwise(0)
        val pr = a.join(broadcast(b), col("a.nk") < col("b.nk"))
          .select(
            (sgn(col("a.rev"), col("b.rev")) * sgn(col("a.cnt"), col("b.cnt")))
              .as("prod"),
            when(col("a.rev") === col("b.rev"), 1L).otherwise(0L).as("tie_a"),
            when(col("a.cnt") === col("b.cnt"), 1L).otherwise(0L).as("tie_b"))
        pr.agg(count(lit(1)).as("n0"),
          sum(when(col("prod") === 1, 1L).otherwise(0L)).as("conc"),
          sum(when(col("prod") === -1, 1L).otherwise(0L)).as("disc"),
          sum(col("tie_a")).as("t_a"), sum(col("tie_b")).as("t_b"))
          .select(col("n0"), col("conc"), col("disc"), col("t_a"), col("t_b"),
            ((col("conc") - col("disc")).cast("double") /
              sqrt((col("n0") - col("t_a")).cast("double") *
                (col("n0") - col("t_b")).cast("double"))).as("tau_b"))
      },
      """WITH m AS (
        |  SELECT n.n_nationkey AS nk,
        |    CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(20,2)) * 100 AS BIGINT)) AS BIGINT) AS rev,
        |    CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS cnt
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  GROUP BY 1),
        |pr AS (
        |  SELECT
        |    (CASE WHEN a.rev > b.rev THEN 1 WHEN a.rev < b.rev THEN -1 ELSE 0 END) *
        |    (CASE WHEN a.cnt > b.cnt THEN 1 WHEN a.cnt < b.cnt THEN -1 ELSE 0 END) AS prod,
        |    CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END AS tie_a,
        |    CASE WHEN a.cnt = b.cnt THEN 1 ELSE 0 END AS tie_b
        |  FROM m a JOIN m b ON a.nk < b.nk),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN prod = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
        |    CAST(sum(CASE WHEN prod = -1 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
        |    CAST(sum(tie_a) AS BIGINT) AS t_a, CAST(sum(tie_b) AS BIGINT) AS t_b
        |  FROM pr)
        |SELECT n0, conc, disc, t_a, t_b,
        |  CAST(conc - disc AS DOUBLE)
        |    / sqrt(CAST((n0 - t_a) AS DOUBLE) * CAST((n0 - t_b) AS DOUBLE)) AS tau_b
        |FROM st""".stripMargin),

    // ------------------------------------------------------------------
    // Brier score (Brier 1950 — public literature) of a deterministic
    // length-based pass-probability against the actual ≥50-token gate,
    // per language: p and y both live on the /100 integer grid, so
    // every squared residual is an exact integer and the score is ONE
    // division — the probabilistic-classifier calibration headline
    // number, exact.
    "brier_score_quality" -> QueryDef(
      (s, dir) => {
        val t = Tables.documents(s, dir).select(col("lang"),
          least(lit(100L), expr("n_chars div 20")).as("p100"),
          when(size(graft.operators.TextOps.tokens(col("text"))) >= 50, 100L)
            .otherwise(0L).as("y100"))
        t.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("y100") === 100, 1L).otherwise(0L)).as("n_pos"),
            sum((col("p100") - col("y100")) * (col("p100") - col("y100")))
              .as("sk2"))
          .select(col("lang"), col("n"), col("n_pos"), col("sk2"),
            (col("sk2").cast("double") / (lit(10000L) * col("n"))).as("brier"))
          .orderBy(col("lang"))
      },
      s"""WITH t AS (
         |  SELECT lang, least(100, n_chars // 20) AS p100,
         |    CASE WHEN len($toksSql) >= 50 THEN 100 ELSE 0 END AS y100
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN y100 = 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  CAST(sum((p100 - y100) * (p100 - y100)) AS BIGINT) AS sk2,
         |  CAST(sum((p100 - y100) * (p100 - y100)) AS DOUBLE)
         |    / (10000 * count(*)) AS brier
         |FROM t GROUP BY 1 ORDER BY lang""".stripMargin),

    // ------------------------------------------------------------------
    // Resource-allocation link prediction (Zhou, Lü & Zhang 2009 —
    // public literature) on the part–order bipartite graph: for part
    // pairs sharing an order, RA = Σ_z 1/deg(z) over common orders z.
    // Order degree is bounded (≤ ~13 parts per order at any SF), so
    // 1/deg rides the lcm(1..13) = 360360 integer scaling — the
    // harmonic-centrality recipe — and the score is exact; ONE final
    // division renders the double. Same inverted-index pair
    // generation as link_prediction_jaccard (no all-pairs stage).
    "resource_allocation_links" -> QueryDef(
      (s, dir) => {
        // shared checkpointed (order, part) artifact (r15) — feeds the
        // degree agg and both self-join sides over the same blocks
        val po = PipelineQueries.orderPartItems(s, dir)
          .select(col("l_partkey").as("p"), col("l_orderkey").as("o"))
        val od = po.groupBy(col("o")).agg(count(lit(1)).as("d"))
        po.select(col("p").as("p1"), col("o"))
          .join(po.select(col("p").as("p2"), col("o")), Seq("o"))
          .filter(col("p1") < col("p2"))
          .join(od, Seq("o"))
          .groupBy(col("p1"), col("p2"))
          .agg(count(lit(1)).as("cn"),
            sum(expr("360360 div d")).as("ra_scaled"))
          .select(col("p1"), col("p2"), col("cn"), col("ra_scaled"),
            (col("ra_scaled").cast("double") / 360360).as("ra"))
          .orderBy(col("ra_scaled").desc, col("p1"), col("p2"))
          .limit(20)
      },
      """WITH po AS (SELECT DISTINCT l_partkey AS p, l_orderkey AS o FROM lineitem),
        |od AS (SELECT o, CAST(count(*) AS BIGINT) AS d FROM po GROUP BY 1),
        |co AS (
        |  SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS cn,
        |    CAST(sum(360360 // od.d) AS BIGINT) AS ra_scaled
        |  FROM po a JOIN po b ON a.o = b.o AND a.p < b.p JOIN od ON od.o = a.o
        |  GROUP BY 1, 2)
        |SELECT p1, p2, cn, ra_scaled, CAST(ra_scaled AS DOUBLE) / 360360 AS ra
        |FROM co ORDER BY ra_scaled DESC, p1, p2 LIMIT 20""".stripMargin),

    // ------------------------------------------------------------------
    // Vocabulary growth curve (Heaps' law, measured exactly): docs in
    // a deterministic md5 shuffle order, token-trigram first-occurrence
    // ranks, cumulative distinct vocabulary at each corpus decile —
    // the "is more data still adding new content" curve a curation
    // team reads before buying the next crawl. First-occurrence =
    // one min-agg per trigram; the decile census is a 10-row range
    // join against it. All integers.
    "heaps_law_trigram_curve" -> QueryDef(
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("toks"))
          .withColumn("rk", row_number().over(
            Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
            .cast("long"))
        val n = t.agg(count(lit(1)).as("nd"))
        val firstocc = t.filter(size(col("toks")) >= 3)
          .select(col("rk"), explode(array_distinct(expr(
            "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))")))
            .as("sh2"))
          .groupBy(col("sh2")).agg(min(col("rk")).as("fr"))
        val cp = s.range(1, 11).select(col("id").as("decile"))
        cp.crossJoin(broadcast(n))
          .select(col("decile"), expr("(decile * nd) div 10").as("n_docs"))
          .join(firstocc, col("fr") <= col("n_docs"))
          .groupBy(col("decile"), col("n_docs"))
          .agg(count(lit(1)).as("vocab"))
          .withColumn("new_trigrams",
            col("vocab") - coalesce(
              lag(col("vocab"), 1).over(Window.orderBy(col("decile"))), lit(0L)))
          .orderBy(col("decile"))
      },
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks,
         |    CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
         |  FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM t),
         |tri AS (
         |  SELECT rk, list_distinct(list_transform(range(1, len(toks) - 1),
         |    i -> array_to_string(toks[i:i+2], ' '))) AS sh
         |  FROM t WHERE len(toks) >= 3),
         |firstocc AS (
         |  SELECT sh2, CAST(min(rk) AS BIGINT) AS fr
         |  FROM (SELECT rk, unnest(sh) AS sh2 FROM tri) GROUP BY 1),
         |cp AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS decile),
         |cov AS (
         |  SELECT cp.decile, (cp.decile * n.nd) // 10 AS n_docs,
         |    CAST(count(*) AS BIGINT) AS vocab
         |  FROM cp CROSS JOIN n JOIN firstocc f ON f.fr <= (cp.decile * n.nd) // 10
         |  GROUP BY 1, 2)
         |SELECT decile, n_docs, vocab,
         |  vocab - coalesce(lag(vocab) OVER (ORDER BY decile), 0) AS new_trigrams
         |FROM cov ORDER BY decile""".stripMargin),

    // ------------------------------------------------------------------
    // Cohort retention triangle — the classic warehouse growth query:
    // users bucketed by FIRST-signup week, distinct-active counts per
    // (cohort, week offset), retention = one division of exact counts.
    // Week arithmetic is pure integer day math from a fixed epoch.
    "cohort_retention_weekly" -> QueryDef(
      (s, dir) => {
        val epoch = lit("2024-01-01").cast("date")
        val coh = Tables.events(s, dir)
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("d0"))
          .select(col("user_id"),
            expr("CAST(datediff(d0, DATE '2024-01-01') div 7 AS BIGINT)").as("cw"))
        val act = Tables.events(s, dir)
          .select(col("user_id"),
            expr("CAST(datediff(to_date(ts), DATE '2024-01-01') div 7 AS BIGINT)")
              .as("aw"))
          .distinct()
        val m = coh.join(act, Seq("user_id"))
          .filter(col("aw") >= col("cw"))
          .groupBy(col("cw"), (col("aw") - col("cw")).as("off"))
          .agg(countDistinct(col("user_id")).as("n_active"))
        val sz = coh.groupBy(col("cw")).agg(count(lit(1)).as("n_cohort"))
        m.join(sz, Seq("cw"))
          .select(col("cw").as("cohort_week"), col("off").as("week_offset"),
            col("n_active"), col("n_cohort"),
            (col("n_active").cast("double") / col("n_cohort")).as("retention"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      """WITH su AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS d0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |coh AS (SELECT user_id,
        |  CAST((CAST(d0 AS DATE) - DATE '2024-01-01') // 7 AS BIGINT) AS cw FROM su),
        |act AS (
        |  SELECT DISTINCT user_id,
        |    CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT) AS aw
        |  FROM events),
        |m AS (
        |  SELECT c.cw, a.aw - c.cw AS off,
        |    CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
        |  FROM coh c JOIN act a ON a.user_id = c.user_id AND a.aw >= c.cw
        |  GROUP BY 1, 2),
        |sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_cohort FROM coh GROUP BY 1)
        |SELECT m.cw AS cohort_week, m.off AS week_offset, m.n_active, sz.n_cohort,
        |  CAST(m.n_active AS DOUBLE) / sz.n_cohort AS retention
        |FROM m JOIN sz ON sz.cw = m.cw
        |ORDER BY cohort_week, week_offset""".stripMargin),

    // ------------------------------------------------------------------
    // Ordered three-step funnel (signup → first view after it → first
    // purchase after that): one conditional min-timestamp pivot per
    // user, strict-order comparisons, conversion rates as single
    // divisions of exact counts. No joins at all — the funnel is a
    // groupBy over the event stream, which is exactly what survives
    // at 100 TB.
    "funnel_three_step" -> QueryDef(
      (s, dir) => {
        val f = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "signup", col("ts"))).as("t_s"),
            min(when(col("event_type") === "view", col("ts"))).as("t_v"),
            min(when(col("event_type") === "purchase", col("ts"))).as("t_p"))
        f.agg(
          sum(when(col("t_s").isNotNull, 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("t_s").isNotNull && col("t_v") > col("t_s"), 1L)
            .otherwise(0L)).as("n_view_after"),
          sum(when(col("t_s").isNotNull && col("t_v") > col("t_s") &&
            col("t_p") > col("t_v"), 1L).otherwise(0L)).as("n_purchase_after"))
          .select(col("n_signup"), col("n_view_after"), col("n_purchase_after"),
            (col("n_view_after").cast("double") / col("n_signup")).as("conv_view"),
            (col("n_purchase_after").cast("double") / col("n_view_after"))
              .as("conv_purchase"))
      },
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_s,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_v,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_p
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT
        |    CAST(sum(CASE WHEN t_s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |    CAST(sum(CASE WHEN t_s IS NOT NULL AND t_v > t_s THEN 1 ELSE 0 END) AS BIGINT) AS n_view_after,
        |    CAST(sum(CASE WHEN t_s IS NOT NULL AND t_v > t_s AND t_p > t_v THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after
        |  FROM f)
        |SELECT n_signup, n_view_after, n_purchase_after,
        |  CAST(n_view_after AS DOUBLE) / n_signup AS conv_view,
        |  CAST(n_purchase_after AS DOUBLE) / n_view_after AS conv_purchase
        |FROM st""".stripMargin),

    // ------------------------------------------------------------------
    // Winsorized mean of the daily order-count series, clamped at the
    // exact P10/P90 ORDER STATISTICS (rank-based, no interpolation —
    // ties resolved by the deterministic (y, day) order): robust-mean
    // twin of trimmed_mean_daily that REPLACES tails instead of
    // dropping them. Clamp sum stays an exact BIGINT; one division.
    "winsorized_mean_daily" -> QueryDef(
      (s, dir) => {
        val d = Tables.orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("y"))
        val w = Window.orderBy(col("y"), col("day"))
        val r = d.withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        val lim = r.agg(
          max(when(col("rn") === greatest(expr("(n * 10) div 100"), lit(1L)),
            col("y"))).as("lo"),
          max(when(col("rn") === expr("(n * 90) div 100"), col("y"))).as("hi"))
        d.crossJoin(broadcast(lim))
          .groupBy(col("lo"), col("hi"))
          .agg(count(lit(1)).as("n_days"),
            sum(when(col("y") < col("lo"), col("lo"))
              .when(col("y") > col("hi"), col("hi"))
              .otherwise(col("y"))).as("wsum"))
          .select(col("n_days"), col("lo"), col("hi"), col("wsum"),
            (col("wsum").cast("double") / col("n_days")).as("winsorized_mean"))
      },
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |r AS (SELECT y, row_number() OVER (ORDER BY y, day) AS rn,
        |        count(*) OVER () AS n FROM d),
        |lim AS (
        |  SELECT max(CASE WHEN rn = greatest((n * 10) // 100, 1) THEN y END) AS lo,
        |         max(CASE WHEN rn = (n * 90) // 100 THEN y END) AS hi
        |  FROM r)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(lim.lo AS BIGINT) AS lo, CAST(lim.hi AS BIGINT) AS hi,
        |  CAST(sum(CASE WHEN y < lo THEN lo WHEN y > hi THEN hi ELSE y END) AS BIGINT) AS wsum,
        |  CAST(sum(CASE WHEN y < lo THEN lo WHEN y > hi THEN hi ELSE y END) AS DOUBLE)
        |    / count(*) AS winsorized_mean
        |FROM d CROSS JOIN lim GROUP BY lim.lo, lim.hi""".stripMargin),

    // ------------------------------------------------------------------
    // Dedup threshold curve: how many near-dup pairs survive at each
    // Jaccard threshold band — the "pick the knob" sweep a curation
    // team runs ONCE from one shared pair frame instead of re-running
    // dedup per candidate threshold. Banding is pure integer floor
    // (10·shared // union) on the exact overlap counters
    // (ngramJaccardPairStats), the cumulative census a 10-row window.
    "dedup_threshold_curve" -> QueryDef(
      (s, dir) => {
        // shared checkpointed pair-STATS artifact over the perturbed
        // corpus at this query's threshold 0.3 (r15) — this query is
        // why the artifact caches the 0.3 band; the 0.5 dedup
        // consumers read it through a map-only filter
        val pairs = PipelineQueries.perturbedPairStats(s, dir)
        val banded = pairs
          .select(expr("CAST((10 * shared) div (n_a + n_b - shared) AS BIGINT)")
            .as("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("n_pairs"))
        banded
          .withColumn("n_at_or_above", sum(col("n_pairs")).over(
            Window.orderBy(col("band").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .orderBy(col("band"))
      },
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |         regexp_replace(text, '^\S+\s*', '') AS text
        |  FROM documents),
        |docs AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 2),
        |      i -> array_to_string(toks[i:i+3], ' '))) AS sh
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
        |      t -> len(t) > 0) AS toks FROM corpus)
        |  WHERE len(toks) >= 4),
        |inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM docs),
        |jp AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         a.n_sh AS n_a, b.n_sh AS n_b, CAST(count(*) AS BIGINT) AS shared
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |kept AS (
        |  SELECT * FROM jp
        |  WHERE CAST(shared AS DOUBLE) / (n_a + n_b - shared) >= 0.3),
        |banded AS (
        |  SELECT CAST((10 * shared) // (n_a + n_b - shared) AS BIGINT) AS band,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM kept GROUP BY 1)
        |SELECT band, n_pairs,
        |  CAST(sum(n_pairs) OVER (ORDER BY band DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_at_or_above
        |FROM banded ORDER BY band""".stripMargin),

    // ------------------------------------------------------------------
    // Stress centrality (Shimbel 1953 — public literature): for every
    // node v of the above-average nation-flow graph, the NUMBER of
    // shortest s–t paths passing through v — Brandes' quantity before
    // the ratio, so everything stays an exact integer (betweenness'
    // σ_st(v)/σ_st divisions never happen). All-pairs BFS with path
    // counting runs as ONE multi-source frontier frame keyed by
    // source (6-round budget, empty-frontier convergence REQUIRED —
    // the bounded 25-node nation grain makes all-pairs exact and
    // cheap; per-source σ stays bounded). The triple join
    // σ(s,v)·σ(v,t)·[d(s,v)+d(v,t)=d(s,t)] is over the bounded
    // nation-pair grain. Oracle unrolls the same 6 rounds.
    "stress_centrality_nations" -> QueryDef(
      (s, dir) => {
        // shared checkpointed nation-flow artifact (r14)
        val flow = GraphLearnQueries.nationFlow(s, dir)
        val tot = flow.agg(sum(col("cnt")).as("t"), count(lit(1)).as("np"))
        val e0 = flow.crossJoin(broadcast(tot))
          .filter(col("cnt") * col("np") > col("t"))
          .select(col("u"), col("v"))
        val e = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
          .distinct().localCheckpoint()
        val nodes = e.select(col("u").as("n")).distinct()
        var sp = nodes.select(col("n").as("s"), col("n").as("vv"),
          lit(0L).as("d"), lit(1L).as("sig")).localCheckpoint()
        var frontier = sp
        var r = 1
        var done = false
        while (r <= 6 && !done) {
          val expanded = frontier
            .join(e, col("vv") === col("u"))
            .groupBy(col("s"), col("v").as("w"))
            .agg(sum(col("sig")).as("nsig"))
          val fresh = expanded
            .join(sp.select(col("s"), col("vv").as("w")), Seq("s", "w"), "left_anti")
            .select(col("s"), col("w").as("vv"), lit(r.toLong).as("d"),
              col("nsig").as("sig"))
            .localCheckpoint()
          if (fresh.isEmpty) done = true
          else { sp = sp.unionByName(fresh).localCheckpoint(); frontier = fresh }
          r += 1
        }
        require(done, s"stress BFS did not converge within 6 rounds")
        val a = sp.filter(col("d") > 0).select(col("s").as("s"),
          col("vv").as("via"), col("d").as("da"), col("sig").as("siga"))
        val b = sp.filter(col("d") > 0).select(col("s").as("via"),
          col("vv").as("t"), col("d").as("db"), col("sig").as("sigb"))
        val c = sp.select(col("s").as("s"), col("vv").as("t"), col("d").as("dst"))
        a.join(b, Seq("via"))
          .join(c, Seq("s", "t"))
          .filter(col("s") < col("t") && col("da") + col("db") === col("dst"))
          .groupBy(col("via").as("nation_key"))
          .agg(sum(col("siga") * col("sigb")).as("stress"))
          .orderBy(col("stress").desc, col("nation_key"))
      }, {
        val rounds = (1 to 6).map { r =>
          s""",
             |f$r AS MATERIALIZED (
             |  SELECT p.s, e.v AS vv, CAST(sum(p.sig) AS BIGINT) AS sig
             |  FROM f${r - 1} p JOIN e ON e.u = p.vv
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM vis${r - 1} x WHERE x.s = p.s AND x.vv = e.v)
             |  GROUP BY 1, 2),
             |vis$r AS MATERIALIZED (
             |  SELECT s, vv, d, sig FROM vis${r - 1}
             |  UNION ALL SELECT s, vv, $r AS d, sig FROM f$r)""".stripMargin
        }.mkString
        s"""WITH flow AS (
           |  SELECT CAST(s.s_nationkey AS BIGINT) AS u, CAST(c.c_nationkey AS BIGINT) AS v,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM lineitem l
           |  JOIN orders o ON o.o_orderkey = l.l_orderkey
           |  JOIN customer c ON c.c_custkey = o.o_custkey
           |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
           |  WHERE s.s_nationkey <> c.c_nationkey
           |  GROUP BY 1, 2),
           |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS np FROM flow),
           |e0 AS (SELECT u, v FROM flow CROSS JOIN tot WHERE cnt * np > t),
           |e AS MATERIALIZED (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
           |nodes AS (SELECT DISTINCT u AS n FROM e),
           |vis0 AS MATERIALIZED (
           |  SELECT n AS s, n AS vv, CAST(0 AS BIGINT) AS d, CAST(1 AS BIGINT) AS sig FROM nodes),
           |f0 AS (SELECT s, vv, sig FROM vis0)$rounds,
           |a AS (SELECT s, vv AS via, d AS da, sig AS siga FROM vis6 WHERE d > 0),
           |b AS (SELECT s AS via, vv AS t, d AS db, sig AS sigb FROM vis6 WHERE d > 0),
           |c AS (SELECT s, vv AS t, d AS dst FROM vis6)
           |SELECT a.via AS nation_key, CAST(sum(a.siga * b.sigb) AS BIGINT) AS stress
           |FROM a JOIN b ON b.via = a.via
           |JOIN c ON c.s = a.s AND c.t = b.t
           |WHERE a.s < b.t AND a.da + b.db = c.dst
           |GROUP BY 1 ORDER BY stress DESC, nation_key""".stripMargin
      }),

    // ------------------------------------------------------------------
    // Simpson's-paradox audit (Simpson 1951 — public literature):
    // return rate of URGENT vs LOW priority, overall and per year.
    // Direction comparisons are integer CROSS-PRODUCTS
    // (a_pos·b_n vs b_pos·a_n) — no rate division ever happens, so
    // the audit is exact; the yr = −1 row is the aggregate. The
    // fixture genuinely flips (1995 reverses the pooled direction) —
    // this is the confounding check every metrics pipeline should run
    // before shipping a headline rate comparison.
    "simpson_paradox_audit" -> QueryDef(
      (s, dir) => {
        val f = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(year(to_date(col("o_orderdate"))).cast("long").as("yr"),
            when(col("o_orderpriority") === "1-URGENT", "a").otherwise("b")
              .as("arm"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
        val per = f.groupBy(col("yr"))
          .agg(sum(when(col("arm") === "a", col("ret")).otherwise(0L)).as("a_pos"),
            sum(when(col("arm") === "a", 1L).otherwise(0L)).as("a_n"),
            sum(when(col("arm") === "b", col("ret")).otherwise(0L)).as("b_pos"),
            sum(when(col("arm") === "b", 1L).otherwise(0L)).as("b_n"))
        val agg = per.agg(lit(-1L).as("yr"), sum(col("a_pos")).as("a_pos"),
          sum(col("a_n")).as("a_n"), sum(col("b_pos")).as("b_pos"),
          sum(col("b_n")).as("b_n"))
        per.unionByName(agg)
          .select(col("yr"), col("a_pos"), col("a_n"), col("b_pos"), col("b_n"),
            when(col("a_pos") * col("b_n") > col("b_pos") * col("a_n"), 1)
              .when(col("a_pos") * col("b_n") < col("b_pos") * col("a_n"), -1)
              .otherwise(0).as("direction"))
          .orderBy(col("yr"))
      },
      """WITH f AS (
        |  SELECT year(o.o_orderdate) AS yr,
        |    CASE WHEN o.o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END AS arm,
        |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')),
        |per AS (
        |  SELECT CAST(yr AS BIGINT) AS yr,
        |    CAST(sum(CASE WHEN arm='a' THEN ret ELSE 0 END) AS BIGINT) AS a_pos,
        |    CAST(sum(CASE WHEN arm='a' THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
        |    CAST(sum(CASE WHEN arm='b' THEN ret ELSE 0 END) AS BIGINT) AS b_pos,
        |    CAST(sum(CASE WHEN arm='b' THEN 1 ELSE 0 END) AS BIGINT) AS b_n
        |  FROM f GROUP BY 1),
        |agg AS (
        |  SELECT CAST(-1 AS BIGINT) AS yr, CAST(sum(a_pos) AS BIGINT) AS a_pos,
        |    CAST(sum(a_n) AS BIGINT) AS a_n, CAST(sum(b_pos) AS BIGINT) AS b_pos,
        |    CAST(sum(b_n) AS BIGINT) AS b_n
        |  FROM per)
        |SELECT yr, a_pos, a_n, b_pos, b_n,
        |  CAST(CASE WHEN a_pos * b_n > b_pos * a_n THEN 1
        |            WHEN a_pos * b_n < b_pos * a_n THEN -1 ELSE 0 END AS INT) AS direction
        |FROM (SELECT * FROM per UNION ALL SELECT * FROM agg)
        |ORDER BY yr""".stripMargin),

    // ------------------------------------------------------------------
    // A/B sample-ratio-mismatch check: users md5-hash-split into two
    // arms, χ² against the intended 50/50. With the 2-cell identity
    // χ² = ((2a−n)² + (2b−n)²) / (2n) the numerator is an exact
    // BIGINT and the statistic is ONE division — the guardrail every
    // experimentation platform runs before reading a single metric.
    "abtest_srm_check" -> QueryDef(
      (s, dir) => {
        val arm = Tables.events(s, dir).select(col("user_id")).distinct()
          .select(when(
            ascii(substring(md5(col("user_id").cast("string")), 1, 1)) % 2 === 0,
            "a").otherwise("b").as("arm"))
        arm.agg(
          sum(when(col("arm") === "a", 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === "b", 1L).otherwise(0L)).as("nb"),
          count(lit(1)).as("n"))
          .select(col("na"), col("nb"), col("n"),
            (((lit(2L) * col("na") - col("n")) * (lit(2L) * col("na") - col("n")) +
              (lit(2L) * col("nb") - col("n")) * (lit(2L) * col("nb") - col("n")))
              .cast("double") / (lit(2L) * col("n"))).as("srm_chi2"))
      },
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |arm AS (SELECT CASE WHEN ascii(substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 = 0
        |               THEN 'a' ELSE 'b' END AS arm FROM u),
        |c AS (SELECT CAST(sum(CASE WHEN arm='a' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |             CAST(sum(CASE WHEN arm='b' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |             CAST(count(*) AS BIGINT) AS n FROM arm)
        |SELECT na, nb, n,
        |  CAST((2*na - n)*(2*na - n) + (2*nb - n)*(2*nb - n) AS DOUBLE) / (2 * n) AS srm_chi2
        |FROM c""".stripMargin),

    // ------------------------------------------------------------------
    // Directed-graph reciprocity of the above-average nation trade
    // flows: the fraction of directed edges whose reverse also
    // crosses the threshold — exact counts via a left-semi-shaped
    // flag join on the reversed edge set, one division.
    "flow_reciprocity_nations" -> QueryDef(
      (s, dir) => {
        // shared checkpointed nation-flow artifact (r14)
        val flow = GraphLearnQueries.nationFlow(s, dir)
        val tot = flow.agg(sum(col("cnt")).as("t"), count(lit(1)).as("np"))
        val e0 = flow.crossJoin(broadcast(tot))
          .filter(col("cnt") * col("np") > col("t"))
          .select(col("u"), col("v"))
          .localCheckpoint() // feeds both sides of the reverse probe
        val rev = e0.select(col("v").as("u"), col("u").as("v"),
          lit(1L).as("has_rev"))
        e0.join(rev, Seq("u", "v"), "left")
          .agg(count(lit(1)).as("n_edges"),
            sum(coalesce(col("has_rev"), lit(0L))).as("n_recip"))
          .select(col("n_edges"), col("n_recip"),
            (col("n_recip").cast("double") / col("n_edges")).as("reciprocity"))
      },
      """WITH flow AS (
        |  SELECT CAST(s.s_nationkey AS BIGINT) AS u, CAST(c.c_nationkey AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  WHERE s.s_nationkey <> c.c_nationkey GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS np FROM flow),
        |e0 AS (SELECT u, v FROM flow CROSS JOIN tot WHERE cnt * np > t),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |    CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM e0 r WHERE r.u = e0.v AND r.v = e0.u)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_recip
        |  FROM e0)
        |SELECT n_edges, n_recip, CAST(n_recip AS DOUBLE) / n_edges AS reciprocity
        |FROM st""".stripMargin),

    // ------------------------------------------------------------------
    // Fano factor (variance-to-mean, Fano 1947 — public literature) of
    // the daily order-count series: burstiness vs a Poisson baseline
    // (F ≈ 1). Moments are exact BIGINT sums; the statistic is a
    // fixed-order expression of three single divisions.
    "fano_burstiness_daily" -> QueryDef(
      (s, dir) => {
        val d = Tables.orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("y"))
        d.agg(count(lit(1)).as("n"), sum(col("y")).as("s1"),
          sum(col("y") * col("y")).as("s2"))
          .select(col("n"), col("s1"), col("s2"),
            ((col("s2").cast("double") / col("n") -
              (col("s1").cast("double") / col("n")) *
                (col("s1").cast("double") / col("n"))) /
              (col("s1").cast("double") / col("n"))).as("fano"))
      },
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s1,
        |        CAST(sum(y*y) AS BIGINT) AS s2 FROM d)
        |SELECT n, s1, s2,
        |  (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
        |    / (CAST(s1 AS DOUBLE) / n) AS fano
        |FROM s""".stripMargin),

    // ------------------------------------------------------------------
    // One-way ANOVA F across the 7 weekdays of the daily order-count
    // series (the brown_forsythe pivot recipe on raw values):
    // SSB = Σnⱼm̄ⱼ² − Nm̄² and SSW = Σy² − Σnⱼm̄ⱼ² assemble from exact
    // BIGINT moments as ONE pivoted 7-term expression in identical
    // textual order. Weekday = integer day arithmetic from a fixed
    // Monday epoch (both engines' dayofweek conventions differ — so
    // neither is used).
    "anova_weekday_orders" -> QueryDef(
      (s, dir) => {
        val d = Tables.orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("y"))
          .select(expr("pmod(datediff(day, DATE '1995-01-02'), 7)").cast("long")
            .as("dow"), col("y"))
        val st = d.groupBy(col("dow"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
            sum(col("y") * col("y")).as("ss"))
        val aggs = Seq(sum(col("n")).as("n_total"), sum(col("s")).as("s_total"),
          sum(col("ss")).as("ss_total")) ++
          (0 until 7).flatMap { i => Seq(
            max(when(col("dow") === i, col("n"))).as(s"n$i"),
            max(when(col("dow") === i, col("s"))).as(s"s$i")) }
        val piv = st.agg(aggs.head, aggs.tail: _*)
        val groupTerm = (0 until 7).map(i =>
          col(s"s$i").cast("double") * col(s"s$i").cast("double") / col(s"n$i"))
          .reduceLeft(_ + _)
        val ssb = groupTerm - col("s_total").cast("double") *
          col("s_total").cast("double") / col("n_total")
        val ssw = col("ss_total").cast("double") - groupTerm
        piv.select(col("n_total"), col("s_total"), col("ss_total"),
          ((ssb / 6) / (ssw / (col("n_total") - 7))).as("anova_f"))
      }, {
        val groupTerm = (0 until 7).map(i =>
          s"CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE) / n$i").mkString(" + ")
        val pivCols = (0 until 7).map { i =>
          s"""    max(CASE WHEN dow = $i THEN n END) AS n$i,
             |    max(CASE WHEN dow = $i THEN s END) AS s$i""".stripMargin
        }.mkString(",\n")
        s"""WITH d AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |w AS (SELECT ((CAST(day - DATE '1995-01-02' AS BIGINT) % 7) + 7) % 7 AS dow, y
           |      FROM d),
           |st AS (
           |  SELECT dow, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
           |    CAST(sum(y*y) AS BIGINT) AS ss
           |  FROM w GROUP BY 1),
           |piv AS (
           |  SELECT CAST(sum(n) AS BIGINT) AS n_total, CAST(sum(s) AS BIGINT) AS s_total,
           |    CAST(sum(ss) AS BIGINT) AS ss_total,
           |$pivCols
           |  FROM st)
           |SELECT n_total, s_total, ss_total,
           |  ((($groupTerm) - CAST(s_total AS DOUBLE) * CAST(s_total AS DOUBLE) / n_total) / 6)
           |    / ((CAST(ss_total AS DOUBLE) - ($groupTerm)) / (n_total - 7)) AS anova_f
           |FROM piv""".stripMargin
      })
  )
}
