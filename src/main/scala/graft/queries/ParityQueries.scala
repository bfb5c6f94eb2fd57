package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.{Clean, TimePred}
import graft.functions.Money.{decSum, decSumSql}

/** The reference's operator inventory (SURVEY.md §2) re-expressed on the
  * driver testdata star schema:
  * fact = `lineitem`; dims = `orders`, `part`, `supplier`,
  * `customer`→`nation`→`region`; time dim derived from
  * `l_shipdate`/`o_orderdate` (the reference derives its dim_tiempo from
  * ANO_EJE/MES_EJE the same way, `sql/CreacionDeDataWareHouse.sql:18-24`).
  *
  * Every query is a lazy declarative plan: filters and projections reach
  * the parquet scans (Catalyst pushdown), small dims broadcast, aggregates
  * run partial+final. All money aggregation uses exact decimal sums
  * ([[graft.functions.Money]]) so results hash-match the DuckDB oracle
  * bit-for-bit; every output is fully deterministically ordered.
  */
object ParityQueries {

  /** Revenue expr: extendedprice*(1-discount) — 4 exact decimal digits. */
  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private val revenueSql = "l_extendedprice * (1 - l_discount)"
  /** Committed-amount analog: extendedprice*(1+tax). */
  private def committed: Column = col("l_extendedprice") * (lit(1) + col("l_tax"))
  private val committedSql = "l_extendedprice * (1 + l_tax)"

  /** lineitem joined to supplier→nation→region (star arm used by the
    * region-level rollups). Only bounded-domain tables (nation=25,
    * region=5) carry explicit broadcast hints; SF-scaling tables
    * (supplier/customer/part) are left to AQE, which broadcasts them
    * when their filtered size permits — an explicit hint would OOM a
    * 100 TB run.
    */
  private def lineitemByRegion(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // A1 — grain consolidation: one row per natural grain, measures summed
    // (`etl/cargar_postgres.py:374-376`).
    "grain_consolidation" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
          .agg(
            decSum(col("l_quantity")).as("sum_qty"),
            decSum(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("l_orderkey"), col("l_partkey"), col("l_suppkey")),
      s"""SELECT l_orderkey, l_partkey, l_suppkey,
         |  ${decSumSql("l_quantity")} AS sum_qty,
         |  ${decSumSql("l_extendedprice")} AS sum_price,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |GROUP BY l_orderkey, l_partkey, l_suppkey
         |ORDER BY l_orderkey, l_partkey, l_suppkey""".stripMargin),

    // ------------------------------------------------------------------
    // Pricing summary (TPC-H Q1 shape): the canonical scan-heavy
    // aggregate — sums, exact-decimal-backed averages, counts per
    // (returnflag, linestatus). Averages computed as decimal-sum /
    // count in double (deterministic) rather than engine avg().
    "pricing_summary" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= to_timestamp_ntz(lit("1998-09-02 00:00:00")))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decSum(col("l_quantity")).as("sum_qty"),
            decSum(col("l_extendedprice")).as("sum_base_price"),
            decSum(revenue, 4).as("sum_disc_price"),
            (sum(col("l_quantity").cast(DecimalType(20, 2))).cast("double") /
              count(lit(1))).as("avg_qty"),
            (sum(col("l_extendedprice").cast(DecimalType(20, 2))).cast("double") /
              count(lit(1))).as("avg_price"),
            (sum(col("l_discount").cast(DecimalType(20, 2))).cast("double") /
              count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      s"""SELECT l_returnflag, l_linestatus,
         |  ${decSumSql("l_quantity")} AS sum_qty,
         |  ${decSumSql("l_extendedprice")} AS sum_base_price,
         |  ${decSumSql(revenueSql, 4)} AS sum_disc_price,
         |  ${decSumSql("l_quantity")} / COUNT(*) AS avg_qty,
         |  ${decSumSql("l_extendedprice")} / COUNT(*) AS avg_price,
         |  ${decSumSql("l_discount")} / COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // ------------------------------------------------------------------
    // A4/P6 — YTD accrual by sector → YTD revenue by supplier region
    // (`sql/ConsultasAlDataWarehouse.sql:2-16`), year=1997 cutoff month=6.
    "ytd_by_region" -> QueryDef(
      (s, dir) =>
        lineitemByRegion(s, dir)
          .filter(TimePred.inYearMonths(col("l_shipdate"), 1997, 1, 6))
          .groupBy(col("r_name"))
          .agg(decSum(revenue, 4).as("devengado_ytd"))
          .orderBy(desc("devengado_ytd"), col("r_name")),
      s"""SELECT r_name, ${decSumSql(revenueSql, 4)} AS devengado_ytd
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE year(l_shipdate) = 1997 AND month(l_shipdate) BETWEEN 1 AND 6
         |GROUP BY r_name
         |ORDER BY devengado_ytd DESC, r_name""".stripMargin),

    // ------------------------------------------------------------------
    // A5/O3 — top-5 executing units by annual accrual → top-5 suppliers by
    // 1997 revenue (`sql/ConsultasAlDataWarehouse.sql:19-33`). Planned as
    // TakeOrderedAndProject (sort+limit top-k), never a full global sort.
    "top5_suppliers" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(TimePred.inYear(col("l_shipdate"), 1997))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(decSum(revenue, 4).as("devengado_anual"))
          .orderBy(desc("devengado_anual"), col("s_name"))
          .limit(5),
      s"""SELECT s_name, ${decSumSql(revenueSql, 4)} AS devengado_anual
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |WHERE year(l_shipdate) = 1997
         |GROUP BY s_name
         |ORDER BY devengado_anual DESC, s_name
         |LIMIT 5""".stripMargin),

    // ------------------------------------------------------------------
    // A6/J9/F10 — share-of-total within a sector → per-customer share of
    // BUILDING-segment order value, YTD 1997-06
    // (`sql/ConsultasAlDataWarehouse.sql:36-60`): two-level aggregate,
    // 1-row global total cross-joined back, guarded division.
    "share_within_segment" -> QueryDef(
      (s, dir) => {
        val ytd = Tables.orders(s, dir)
          .filter(TimePred.inYearMonths(col("o_orderdate"), 1997, 1, 6))
          .join(
            Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_name"))
          .agg(sum(col("o_totalprice").cast(DecimalType(20, 2))).as("dev_dec"))
        val tot = ytd.agg(sum(col("dev_dec")).as("tot_dec"))
        ytd.crossJoin(broadcast(tot))
          .select(
            col("c_name"),
            col("dev_dec").cast("double").as("dev_ytd"),
            Clean.divisionSegura(
              col("dev_dec").cast("double"), col("tot_dec").cast("double")).as("share"))
          .orderBy(desc("dev_ytd"), col("c_name"))
      },
      """WITH ytd AS (
        |  SELECT c_name, SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS dev_dec
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE year(o_orderdate) = 1997 AND month(o_orderdate) BETWEEN 1 AND 6
        |    AND c_mktsegment = 'BUILDING'
        |  GROUP BY c_name
        |), tot AS (SELECT SUM(dev_dec) AS tot_dec FROM ytd)
        |SELECT y.c_name,
        |  CAST(y.dev_dec AS DOUBLE) AS dev_ytd,
        |  CASE WHEN CAST(t.tot_dec AS DOUBLE) > 0
        |       THEN CAST(y.dev_dec AS DOUBLE) / CAST(t.tot_dec AS DOUBLE)
        |       ELSE 0.0 END AS share
        |FROM ytd y CROSS JOIN tot t
        |ORDER BY dev_ytd DESC, c_name""".stripMargin),

    // ------------------------------------------------------------------
    // A7/F11/O3 — backlog (committed − accrued) by expense classifier →
    // by part brand, HAVING > 0, top-20
    // (`sql/ConsultasAlDataWarehouse.sql:64-83`).
    "backlog_by_brand" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(TimePred.inYearMonths(col("l_shipdate"), 1997, 1, 6))
          .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            sum(committed.cast(DecimalType(20, 4))).as("com_dec"),
            sum(revenue.cast(DecimalType(20, 4))).as("dev_dec"))
          .withColumn("backlog_dec", col("com_dec") - col("dev_dec"))
          .filter(col("backlog_dec") > 0)
          .select(
            col("p_brand"),
            col("com_dec").cast("double").as("comprometido_ytd"),
            col("dev_dec").cast("double").as("devengado_ytd"),
            col("backlog_dec").cast("double").as("backlog"))
          .orderBy(desc("backlog"), col("p_brand"))
          .limit(20),
      s"""SELECT p_brand,
         |  CAST(com_dec AS DOUBLE) AS comprometido_ytd,
         |  CAST(dev_dec AS DOUBLE) AS devengado_ytd,
         |  CAST(com_dec - dev_dec AS DOUBLE) AS backlog
         |FROM (
         |  SELECT p_brand,
         |    SUM(CAST($committedSql AS DECIMAL(20,4))) AS com_dec,
         |    SUM(CAST($revenueSql AS DECIMAL(20,4))) AS dev_dec
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE year(l_shipdate) = 1997 AND month(l_shipdate) BETWEEN 1 AND 6
         |  GROUP BY p_brand
         |) WHERE com_dec - dev_dec > 0
         |ORDER BY backlog DESC, p_brand
         |LIMIT 20""".stripMargin),

    // ------------------------------------------------------------------
    // A8/P7/O2 — quarterly evolution by government level → quarterly order
    // value by customer region, 1996-1998
    // (`sql/ConsultasAlDataWarehouse.sql:86-101`).
    "quarterly_by_region" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(TimePred.inYears(col("o_orderdate"), 1996, 1998))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(
            year(col("o_orderdate")).as("anio"),
            quarter(col("o_orderdate")).as("trimestre"),
            col("r_name"))
          .agg(decSum(col("o_totalprice")).as("dev_trimestral"))
          .orderBy(col("anio"), col("trimestre"), col("r_name")),
      s"""SELECT CAST(year(o_orderdate) AS INT) AS anio,
         |  CAST(quarter(o_orderdate) AS INT) AS trimestre,
         |  r_name,
         |  ${decSumSql("o_totalprice")} AS dev_trimestral
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE year(o_orderdate) BETWEEN 1996 AND 1998
         |GROUP BY 1, 2, 3
         |ORDER BY anio, trimestre, r_name""".stripMargin),

    // ------------------------------------------------------------------
    // J5/A2 — 8-way star join + monthly aggregate view
    // (`sql/CreacionDeUsuariosyVistas.sql:106-179`): the full star joined
    // once, grouped at month grain with COALESCE'd measures.
    "monthly_star_rollup" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .groupBy(
            year(col("o_orderdate")).as("anio"),
            month(col("o_orderdate")).as("mes"),
            quarter(col("o_orderdate")).as("trimestre"),
            col("r_name"),
            col("o_orderstatus"))
          .agg(
            decSum(coalesce(col("l_quantity"), lit(0.0))).as("sum_qty"),
            decSum(coalesce(col("l_extendedprice"), lit(0.0))).as("sum_price"),
            decSum(coalesce(revenue, lit(0.0)), 4).as("sum_revenue"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("anio"), col("mes"), col("r_name"), col("o_orderstatus")),
      s"""SELECT CAST(year(o_orderdate) AS INT) AS anio,
         |  CAST(month(o_orderdate) AS INT) AS mes,
         |  CAST(quarter(o_orderdate) AS INT) AS trimestre,
         |  r_name, o_orderstatus,
         |  ${decSumSql("COALESCE(l_quantity, 0)")} AS sum_qty,
         |  ${decSumSql("COALESCE(l_extendedprice, 0)")} AS sum_price,
         |  ${decSumSql(s"COALESCE($revenueSql, 0)", 4)} AS sum_revenue,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY 1, 2, 3, 4, 5
         |ORDER BY anio, mes, r_name, o_orderstatus""".stripMargin),

    // ------------------------------------------------------------------
    // A3/J7 — annual aggregate view → per-year, per-region, per-status
    // totals (`sql/CreacionDeUsuariosyVistas.sql:185-196`).
    "annual_rollup" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(year(col("o_orderdate")).as("anio"), col("r_name"), col("o_orderstatus"))
          .agg(decSum(col("o_totalprice")).as("total_anual"), count(lit(1)).as("n_orders"))
          .orderBy(col("anio"), col("r_name"), col("o_orderstatus")),
      s"""SELECT CAST(year(o_orderdate) AS INT) AS anio, r_name, o_orderstatus,
         |  ${decSumSql("o_totalprice")} AS total_anual,
         |  COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2, 3
         |ORDER BY anio, r_name, o_orderstatus""".stripMargin),

    // ------------------------------------------------------------------
    // J2 — anti-join new-key detection (`etl/cargar_postgres.py:355-357`)
    // → customers with no order in 1998 (year filter keeps the result
    // non-empty at every SF, so the check is not vacuous).
    "antijoin_customers_without_orders" -> QueryDef(
      (s, dir) =>
        Tables.customer(s, dir)
          .join(
            Tables.orders(s, dir)
              .filter(TimePred.inYear(col("o_orderdate"), 1998))
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey")),
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND year(o_orderdate) = 1998)
        |ORDER BY c_custkey""".stripMargin),

    // ------------------------------------------------------------------
    // A10/J3 — natural-key dedup + attribute recovery
    // (`etl/cargar_postgres.py:355-360`): distinct dim keys with a
    // deterministic representative row (min key wins, mirroring
    // first-write-wins dim inserts).
    "dedup_dim_keys" -> QueryDef(
      (s, dir) =>
        Tables.customer(s, dir)
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(min(col("c_custkey")).as("first_custkey"), count(lit(1)).as("n_members"))
          .orderBy(col("c_nationkey"), col("c_mktsegment")),
      """SELECT c_nationkey, c_mktsegment,
        |  MIN(c_custkey) AS first_custkey,
        |  COUNT(*) AS n_members
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin),

    // ------------------------------------------------------------------
    // F6 — dim_tiempo month spine, 2010-01..2030-12 = 252 rows
    // (`sql/CreacionDeDataWareHouse.sql:18-24`).
    "time_spine" -> QueryDef(
      (s, dir) =>
        s.range(1)
          .select(explode(sequence(
            to_date(lit("2010-01-01")), to_date(lit("2030-12-01")),
            expr("interval 1 month"))).as("fecha"))
          .select(
            col("fecha"),
            year(col("fecha")).as("anio"),
            month(col("fecha")).as("mes"),
            quarter(col("fecha")).as("trimestre"))
          .orderBy(col("fecha")),
      """SELECT CAST(range AS DATE) AS fecha,
        |  CAST(year(range) AS INT) AS anio,
        |  CAST(month(range) AS INT) AS mes,
        |  CAST(quarter(range) AS INT) AS trimestre
        |FROM range(DATE '2010-01-01', DATE '2030-12-02', INTERVAL 1 MONTH)
        |ORDER BY fecha""".stripMargin),

    // ------------------------------------------------------------------
    // P4 — FK-completeness diagnostics (`etl/cargar_postgres.py:365-374`):
    // total rows vs per-key null counts (all-in-one-pass aggregate).
    "fk_null_diagnostics" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .agg(
            count(lit(1)).as("total_rows"),
            count(when(col("l_orderkey").isNull, 1)).as("null_orderkey"),
            count(when(col("l_partkey").isNull, 1)).as("null_partkey"),
            count(when(col("l_suppkey").isNull, 1)).as("null_suppkey"),
            count(when(
              col("l_orderkey").isNotNull && col("l_partkey").isNotNull &&
                col("l_suppkey").isNotNull, 1)).as("fk_complete_rows")),
      """SELECT COUNT(*) AS total_rows,
        |  COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS null_orderkey,
        |  COUNT(CASE WHEN l_partkey IS NULL THEN 1 END) AS null_partkey,
        |  COUNT(CASE WHEN l_suppkey IS NULL THEN 1 END) AS null_suppkey,
        |  COUNT(CASE WHEN l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        |             AND l_suppkey IS NOT NULL THEN 1 END) AS fk_complete_rows
        |FROM lineitem""".stripMargin),

    // ------------------------------------------------------------------
    // F1/F8/F4 — cleaning kernel over documents: whitespace collapse,
    // blank-to-placeholder, trim (`etl/transformar_mensual.py:91-94`,
    // `sql/CreacionDeUsuariosyVistas.sql:127-133`).
    "clean_text_kernel" -> QueryDef(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            Clean.limpiarTexto(col("text")).as("text_clean"),
            Clean.conPlaceholder(col("lang"), "SIN LANG").as("lang_norm"),
            Clean.aCadena(col("source")).as("source_norm"))
          .orderBy(col("doc_id")),
      """SELECT doc_id,
        |  trim(regexp_replace(COALESCE(CAST(text AS VARCHAR), ''), '\s+', ' ', 'g')) AS text_clean,
        |  COALESCE(NULLIF(TRIM(lang), ''), 'SIN LANG') AS lang_norm,
        |  TRIM(CAST(source AS VARCHAR)) AS source_norm
        |FROM documents
        |ORDER BY doc_id""".stripMargin),

    // ------------------------------------------------------------------
    // F2/F3 — coerce-to-null numeric parse + year/month → date derivation
    // (`etl/transformar_mensual.py:86-105`) over events.props (JSON-ish
    // strings) and event timestamps.
    "coerce_and_dates" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir)
          .select(
            col("event_id"),
            Clean.aNumero(regexp_extract(col("props"), "[0-9]+(\\.[0-9]+)?", 0)).as("k_num"),
            Clean.aNumero(col("event_type")).as("bad_parse"),
            Clean.construirFecha(year(col("ts")), month(col("ts"))).as("fecha_mes"))
          .orderBy(col("event_id")),
      """SELECT event_id,
        |  TRY_CAST(regexp_extract(props, '[0-9]+(\.[0-9]+)?', 0) AS DOUBLE) AS k_num,
        |  TRY_CAST(event_type AS DOUBLE) AS bad_parse,
        |  make_date(CAST(year(ts) AS INT), CAST(month(ts) AS INT), 1) AS fecha_mes
        |FROM events
        |ORDER BY event_id""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q3 shape (shipping priority): 3-way join, anti-correlated
    // date predicates on both fact arms, revenue top-10. Both date
    // filters are pushdown-friendly ranges on the scans; the join order
    // (customer filter → orders → lineitem) lets AQE broadcast the
    // filtered build sides; TakeOrderedAndProject caps the output.
    "tpch_q3_shipping_priority" -> QueryDef(
      (s, dir) =>
        Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp")),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.lineitem(s, dir)
            .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"),
            col("o_orderdate").cast("date").as("orderdate"))
          .agg(decSum(revenue, 4).as("revenue"))
          .select(col("l_orderkey"), col("revenue"), col("orderdate"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10),
      s"""SELECT l.l_orderkey,
         |  ${decSumSql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
         |  CAST(o.o_orderdate AS DATE) AS orderdate
         |FROM customer c
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l.l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY 1, 3
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q5 shape (local supplier volume): the 6-way star with the
    // supplier-nation = customer-nation CO-LOCATION predicate — the
    // join that rewards broadcast dims (nation/region) and punishes
    // engines that shuffle the fact twice. One order-year range, ASIA
    // region, revenue by nation.
    "tpch_q5_local_supplier" -> QueryDef(
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.supplier(s, dir),
            col("s_suppkey") === col("l_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("n_nationkey") === col("c_nationkey"))
          .join(broadcast(Tables.region(s, dir))
            .filter(col("r_name") === "ASIA"),
            col("r_regionkey") === col("n_regionkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(decSum(revenue, 4).as("revenue"))
          .orderBy(col("revenue").desc, col("nation")),
      s"""SELECT n.n_name AS nation,
         |  ${decSumSql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
         |FROM customer c
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
         |JOIN nation n ON n.n_nationkey = c.c_nationkey
         |JOIN region r ON r.r_regionkey = n.n_regionkey
         |WHERE r.r_name = 'ASIA'
         |  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY 1 ORDER BY revenue DESC, nation""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q10 shape (returned items): quarter-bounded orders join
    // return-flagged lineitems, revenue per (customer, nation), top-20
    // loss drivers. The returnflag filter prunes lineitem at the scan;
    // nation broadcasts.
    "tpch_q10_returned_items" -> QueryDef(
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("n_nationkey") === col("c_nationkey"))
          .groupBy(col("c_custkey"), col("n_name").as("nation"))
          .agg(decSum(revenue, 4).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20),
      s"""SELECT c.c_custkey, n.n_name AS nation,
         |  ${decSumSql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM customer c
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN nation n ON n.n_nationkey = c.c_nationkey
         |WHERE l.l_returnflag = 'R'
         |  AND o.o_orderdate >= TIMESTAMP '1997-10-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q18 shape (large-volume customer): the HAVING-on-SUM
    // semi-join stress test. The classic spec restates the outer
    // SUM(l_quantity) after an IN-subquery on the same grain; the
    // Spark-first plan aggregates lineitem ONCE at the order grain,
    // filters the HAVING there, and joins orders/customer onto the
    // surviving keys — no second lineitem scan, no subquery re-scan.
    // l_quantity is integral → the qualifying sum is an exact BIGINT.
    // Threshold 150 keeps ~20% of orders at every SF (driver data has
    // ~4 lines/order; the spec's 300 assumes 7). Top-100 by total
    // price plans as TakeOrderedAndProject.
    "tpch_q18_large_orders" -> QueryDef(
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
          .filter(col("sum_qty") > 150)
        big
          .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate").cast("date").as("orderdate"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |  CAST(o.o_orderdate AS DATE) AS orderdate, o.o_totalprice, b.sum_qty
        |FROM big b
        |JOIN orders o ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q21 shape (suppliers who kept orders waiting): the
    // multi-way EXISTS / NOT-EXISTS stress test — a left-SEMI join
    // (some other supplier contributed to the order) composed with a
    // left-ANTI join (no other supplier was late on it) over the same
    // late-lineitem frame. "Late" adapts to the driver schema as
    // l_shipdate > o_orderdate + 60 days (no receipt/commit dates);
    // the nation dim joins broadcast (the spec's single-nation filter
    // is dropped — at sf0.001 it would leave ~0 suppliers). Both
    // correlated subqueries become keyed joins with a residual
    // supplier-inequality condition: no cartesian product, no
    // per-row re-scan of lineitem.
    "tpch_q21_waiting_supplier" -> QueryDef(
      (s, dir) => {
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val late = Tables.lineitem(s, dir)
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"))
        val others = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
        val lateOthers = late
          .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
        late
          .join(others,
            col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
            "left_semi")
          .join(lateOthers,
            col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
            "left_anti")
          .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("n_nationkey") === col("s_nationkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      """WITH ord AS (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'),
        |late AS (
        |  SELECT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN ord o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM late l1
        |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q20 shape (excess-share supplier): the correlated
    // aggregate-threshold subquery ("suppliers whose shipped quantity
    // for some part exceeds a threshold derived from that part's own
    // aggregate") planned Spark-first as two pre-aggregations joined
    // on the part key — the (part, supplier) grain agg meets the
    // part-total agg once, no per-supplier re-scan. The threshold is
    // 2× the part's AVERAGE supplier share (s·n_supp > 2·total —
    // scale-invariant, unlike a fixed share on data where supplier
    // fan-out grows with SF), compared in exact integers. Count of
    // dominated parts per supplier, supplier dim joined at the end.
    "tpch_q20_dominant_supplier" -> QueryDef(
      (s, dir) => {
        val ps = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast("long")).as("s_qty"))
        val pt = ps
          .groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("s_qty")).as("p_qty"), count(lit(1)).as("n_supp"))
        ps.join(pt, col("l_partkey") === col("pk"))
          .filter(col("s_qty") * col("n_supp") > col("p_qty") * 2)
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n_dominated_parts"),
            sum(col("s_qty")).as("qty_dominated"))
          .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("n_dominated_parts"), col("qty_dominated"))
          .orderBy(col("n_dominated_parts").desc, col("s_suppkey"))
      },
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_qty
        |  FROM lineitem GROUP BY 1, 2),
        |pt AS (
        |  SELECT l_partkey, CAST(SUM(s_qty) AS BIGINT) AS p_qty,
        |    CAST(count(*) AS BIGINT) AS n_supp
        |  FROM ps GROUP BY 1),
        |dom AS (
        |  SELECT ps.l_suppkey, CAST(count(*) AS BIGINT) AS n_dominated_parts,
        |    CAST(SUM(ps.s_qty) AS BIGINT) AS qty_dominated
        |  FROM ps JOIN pt ON pt.l_partkey = ps.l_partkey
        |  WHERE ps.s_qty * pt.n_supp > pt.p_qty * 2
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, d.n_dominated_parts, d.qty_dominated
        |FROM dom d JOIN supplier s ON s.s_suppkey = d.l_suppkey
        |ORDER BY n_dominated_parts DESC, s_suppkey""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q4 shape (order-priority checking): the canonical correlated
    // EXISTS — count quarter-bounded orders having at least one late
    // line. The spec's l_commitdate < l_receiptdate becomes
    // l_shipdate > o_orderdate + 30 days on the driver schema (no
    // commit/receipt dates; Q21 uses the same adaptation at 60 days).
    // Spark-first the EXISTS decorrelates into ONE left-semi hash join
    // on the order key with the lateness residual evaluated on the
    // joined row — no per-order re-scan of lineitem, and the quarter
    // range prunes the orders scan before the join.
    "tpch_q4_order_priority" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
          .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate")),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority")),
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-07-01' AND o.o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q13 shape (customer order-count distribution): the only
    // canonical OUTER-join-aggregate — customers LEFT JOIN a filtered
    // orders side (the spec excludes comment-pattern orders; the driver
    // schema has no comment, so one priority class is excluded), count
    // per customer with zero-preserved for order-less customers, then a
    // second aggregate turns counts into a histogram. count(o_orderkey)
    // skips the outer join's nulls, so the filter lives on the orders
    // build side (NOT a post-join WHERE, which would turn the outer
    // join inner). Both aggregates are partial+final; no fact re-scan.
    "tpch_q13_customer_distribution" -> QueryDef(
      (s, dir) =>
        Tables.customer(s, dir)
          .select(col("c_custkey"))
          .join(Tables.orders(s, dir)
            .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
            .select(col("o_custkey"), col("o_orderkey")),
            col("o_custkey") === col("c_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc),
      """WITH c_orders AS (
        |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM c_orders GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q17 shape (small-quantity-order revenue): the classic
    // correlated scalar-subquery — lines whose quantity is below 20% of
    // their part's own average. Decorrelated as the Q20 recipe: ONE
    // per-part aggregate joined back on the part key. The threshold
    // compares in exact integers (qty < 0.2·(t/n) ⟺ 5·qty·n < t;
    // l_quantity is integral) so no double average is ever formed; the
    // part-type filter prunes BEFORE both the aggregate and the join
    // (the correlated aggregate restricted to filtered parts is
    // value-identical to the spec's all-lines average for those parts).
    // avg_yearly is one decimal-exact sum divided by the literal 7.0 —
    // a single IEEE division, identical on both engines.
    "tpch_q17_small_quantity" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.part(s, dir)
            .filter(col("p_type") === "PROMO")
            .select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"), col("p_brand"),
            col("l_quantity").cast("long").as("qty"), col("l_extendedprice"))
        val pq = li
          .groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("qty")).as("t_qty"), count(lit(1)).as("n_lines"))
        li.join(pq, col("l_partkey") === col("pk"))
          .filter(col("qty") * 5 * col("n_lines") < col("t_qty"))
          .groupBy(col("p_brand"))
          .agg((decSum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
            count(lit(1)).as("n_small"))
          .orderBy(col("p_brand"))
      },
      """WITH li AS (
        |  SELECT l.l_partkey, p.p_brand, CAST(l.l_quantity AS BIGINT) AS qty,
        |         l.l_extendedprice
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_type = 'PROMO'),
        |pq AS (
        |  SELECT l_partkey AS pk, CAST(SUM(qty) AS BIGINT) AS t_qty,
        |         CAST(count(*) AS BIGINT) AS n_lines
        |  FROM li GROUP BY 1)
        |SELECT li.p_brand,
        |  CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n_small
        |FROM li JOIN pq ON pq.pk = li.l_partkey
        |WHERE li.qty * 5 * pq.n_lines < pq.t_qty
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q22 shape (global sales opportunity): substring bucketing +
    // global-average threshold + NOT EXISTS. The "country code" is the
    // last digit of the zero-padded customer name (the driver schema
    // has no phone); the threshold is the average positive balance over
    // the selected codes (one decimal-exact sum ÷ a count — a single
    // IEEE division, identical both engines) crossed in as a 1-row
    // broadcast (the J9 shape); the NOT EXISTS — "never placed an
    // URGENT order" on the comment-less schema — is ONE left-anti hash
    // join against the priority-pruned orders scan. No correlated
    // re-scan anywhere.
    "tpch_q22_global_sales" -> QueryDef(
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"),
            substring(col("c_name"), 18, 1).as("cntrycode"), col("c_acctbal"))
          .filter(col("cntrycode").isin("1", "3", "5", "7", "9"))
        val avgRow = cust
          .filter(col("c_acctbal") > 0)
          .agg((decSum(col("c_acctbal")) /
            count(lit(1)).cast("double")).as("avg_pos"))
        cust
          .crossJoin(broadcast(avgRow))
          .filter(col("c_acctbal") > col("avg_pos"))
          .join(Tables.orders(s, dir)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .groupBy(col("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            decSum(col("c_acctbal")).as("totacctbal"))
          .orderBy(col("cntrycode"))
      },
      """WITH cust AS (
        |  SELECT c_custkey, substring(c_name, 18, 1) AS cntrycode, c_acctbal
        |  FROM customer WHERE substring(c_name, 18, 1) IN ('1','3','5','7','9')),
        |avgbal AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(20,2))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS avg_pos
        |  FROM cust WHERE c_acctbal > 0)
        |SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(20,2))) AS DOUBLE) AS totacctbal
        |FROM cust, avgbal
        |WHERE c_acctbal > avg_pos
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = cust.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q7 shape (volume shipping between nation pair): the
    // DISJUNCTIVE cross-nation predicate — revenue flowing in either
    // direction between two specific nations, by supplier-nation ×
    // customer-nation × ship-year. The OR of the two directed pairs
    // cannot be pushed into either scan; it evaluates as a residual
    // after the two broadcast nation joins, which is the planner
    // stress the shape exists for. Nation pair chosen to be populated
    // at every driver SF (suppliers are sparse across nations at
    // sf0.001).
    "tpch_q7_nation_volume" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))),
            col("nk1") === col("s_nationkey"))
          .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))),
            col("nk2") === col("c_nationkey"))
          .filter(
            (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_12") ||
              (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(decSum(revenue, 4).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year")),
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l.l_shipdate) AS INT) AS l_year,
         |  ${decSumSql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
         |FROM lineitem l
         |JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
         |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_12')
         |    OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_3'))
         |  AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q8 shape (national market share): one nation's share of
    // region-wide order volume per year — the conditional-aggregate
    // ratio (SUM(CASE)/SUM) computed in ONE pass over the 7-way join,
    // never two scans. Both sums are exact decimals; the share is a
    // single IEEE division of their double casts (identical textual
    // order both engines).
    "tpch_q8_market_share" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("nk1"), col("n_regionkey"))),
            col("nk1") === col("c_nationkey"))
          .join(broadcast(Tables.region(s, dir))
            .filter(col("r_name") === "ASIA"),
            col("r_regionkey") === col("n_regionkey"))
          .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("nk2"), col("n_name").as("supp_nation"))),
            col("nk2") === col("s_nationkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            decSum(when(col("supp_nation") === "NATION_3", revenue)
              .otherwise(lit(0)), 4).as("nation_volume"),
            decSum(revenue, 4).as("total_volume"))
          .select(col("o_year"), col("nation_volume"), col("total_volume"),
            (col("nation_volume") / col("total_volume")).as("mkt_share"))
          .orderBy(col("o_year")),
      s"""WITH vol AS (
         |  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         |    l.l_extendedprice * (1 - l.l_discount) AS volume,
         |    n2.n_name AS supp_nation
         |  FROM lineitem l
         |  JOIN orders o ON o.o_orderkey = l.l_orderkey
         |  JOIN customer c ON c.c_custkey = o.o_custkey
         |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
         |  JOIN region r ON r.r_regionkey = n1.n_regionkey
         |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
         |  WHERE r.r_name = 'ASIA'
         |    AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'),
         |agg AS (
         |  SELECT o_year,
         |    ${decSumSql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END", 4)} AS nation_volume,
         |    ${decSumSql("volume", 4)} AS total_volume
         |  FROM vol GROUP BY 1)
         |SELECT o_year, nation_volume, total_volume,
         |  nation_volume / total_volume AS mkt_share
         |FROM agg ORDER BY o_year""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q9 shape (product-type profit): profit = revenue − cost
    // over a part-name pattern, by supplier nation × ship-year. Cost
    // adapts to the driver schema as retailprice × quantity (no
    // ps_supplycost). The two sums keep their OWN exact-decimal scales
    // (4 for price×(1−disc), 2 for price×integral qty) and subtract
    // once as doubles — the F11 SUM(a)−SUM(b) law, never a double sum.
    // The name LIKE filter prunes part before the fact join.
    "tpch_q9_product_profit" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.part(s, dir).filter(col("p_name").like("%widget%")),
            col("p_partkey") === col("l_partkey"))
          .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("n_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("l_shipdate")).as("o_year"))
          .agg((decSum(revenue, 4) -
            decSum(col("p_retailprice") * col("l_quantity"))).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc),
      s"""SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS o_year,
         |  ${decSumSql("l.l_extendedprice * (1 - l.l_discount)", 4)} -
         |    ${decSumSql("p.p_retailprice * l.l_quantity", 2)} AS sum_profit
         |FROM lineitem l
         |JOIN part p ON p.p_partkey = l.l_partkey
         |JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |JOIN nation n ON n.n_nationkey = s.s_nationkey
         |WHERE p.p_name LIKE '%widget%'
         |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q12 shape (shipping-priority audit): lines bucketed by
    // lateness (the driver schema's shipmode analog: shipped >45 days
    // after ordering), counting high- vs low-priority orders per
    // bucket in ONE pass — two conditional counts, no second scan, no
    // pivot. Exact integers end to end.
    "tpch_q12_priority_lateness" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir)
            .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(
            when(col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 45 DAYS"), "late")
              .otherwise("ontime").as("ship_bucket"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count"))
          .orderBy(col("ship_bucket")),
      """SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
        |            THEN 'late' ELSE 'ontime' END AS ship_bucket,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q14 shape (promo-revenue share): the single-pass
    // conditional-aggregate percentage — 100·SUM(CASE promo)/SUM over
    // one month of shipments. Both sums exact decimal; the percentage
    // is (100·num)/den in identical left-associated order both
    // engines.
    "tpch_q14_promo_share" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
          .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
          .agg(
            decSum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0)), 4)
              .as("num"),
            decSum(revenue, 4).as("den"))
          .select((lit(100.0) * col("num") / col("den")).as("promo_revenue")),
      s"""WITH agg AS (
         |  SELECT
         |    ${decSumSql("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 4)} AS num,
         |    ${decSumSql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS den
         |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |  WHERE l.l_shipdate >= TIMESTAMP '1996-09-01' AND l.l_shipdate < TIMESTAMP '1996-10-01')
         |SELECT CAST(100.0 AS DOUBLE) * num / den AS promo_revenue FROM agg""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q15 shape (top supplier): per-supplier quarter revenue,
    // keep the max — the classic view + global-aggregate join, planned
    // as ONE revenue aggregate reused by both the max (1-row broadcast
    // cross join, J9 shape) and the equality probe. Revenue equality
    // compares doubles cast from exact decimal sums — identical bits
    // both engines, so the tie set is engine-independent.
    "tpch_q15_top_supplier" -> QueryDef(
      (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(decSum(revenue, 4).as("total_revenue"))
          .localCheckpoint() // feeds the max agg AND the equality probe
        val mx = rev.agg(max(col("total_revenue")).as("m"))
        rev.crossJoin(broadcast(mx))
          .filter(col("total_revenue") === col("m"))
          .join(Tables.supplier(s, dir), col("s_suppkey") === col("supplier_no"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      s"""WITH rev AS (
         |  SELECT l_suppkey AS supplier_no,
         |    ${decSumSql("l_extendedprice * (1 - l_discount)", 4)} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1),
         |mx AS (SELECT max(total_revenue) AS m FROM rev)
         |SELECT s.s_suppkey, s.s_name, r.total_revenue
         |FROM rev r JOIN supplier s ON s.s_suppkey = r.supplier_no CROSS JOIN mx
         |WHERE r.total_revenue = mx.m
         |ORDER BY s.s_suppkey""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q16 shape (supplier-part relationship count): DISTINCT
    // suppliers per part attribute triple, with a NOT-IN supplier
    // exclusion — the exclusion decorrelates into one left-anti join
    // BEFORE the distinct aggregate (never a per-row subquery), and
    // the part-attribute filters prune the dimension before the fact
    // join. The distinct count is partial-aggregated on (attrs,
    // suppkey) first.
    "tpch_q16_supplier_parts" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.part(s, dir)
            .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)),
            col("p_partkey") === col("l_partkey"))
          .join(Tables.supplier(s, dir)
            .filter(col("s_suppkey") % 3 === 0).select(col("s_suppkey")),
            col("s_suppkey") === col("l_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc,
            col("p_brand"), col("p_type"), col("p_size")),
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 3 = 0)
        |GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, 1, 2, 3""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    // the OR-of-conjunctions over join-crossing attributes — the
    // classic test of whether an engine evaluates the disjunction as
    // a post-join residual (correct) while still pushing the
    // per-branch part filters into a unified scan range. One exact
    // decimal sum out.
    "tpch_q19_disjunctive_revenue" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
              (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
                col("l_quantity").between(5, 30)) ||
              (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
                col("l_quantity").between(10, 40)))
          .agg(decSum(revenue, 4).as("revenue")),
      s"""SELECT ${decSumSql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
         |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
         |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 5 AND 30)
         |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 10 AND 40)""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q2 shape (minimum-cost supplier): the correlated-MIN
    // subquery — for each filtered part, the supplier(s) offering it
    // at the lowest unit price. Decorrelated as the Q17/Q20 recipe:
    // ONE (part, supplier) aggregate, ONE per-part min joined back on
    // the part key, equality probe on the unit cost. Unit cost is an
    // exact-decimal price sum over an exact-integer quantity sum, ONE
    // IEEE division each — identical bits both engines, so the
    // min-equality tie set is engine-independent (no supply-cost
    // column in the driver schema; shipped unit price is the analog).
    "tpch_q2_min_cost_supplier" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.part(s, dir)
            .filter(col("p_type") === "ECONOMY" && col("p_size") <= 25)
            .select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"), col("l_suppkey"), col("p_brand"),
            col("l_extendedprice"), col("l_quantity"))
        val ps = li
          .groupBy(col("l_partkey"), col("l_suppkey"), col("p_brand"))
          .agg((decSum(col("l_extendedprice")) /
            sum(col("l_quantity").cast("long")).cast("double")).as("unit_cost"))
        val mn = ps
          .groupBy(col("l_partkey").as("pk"))
          .agg(min(col("unit_cost")).as("min_cost"))
        ps.join(mn,
            col("l_partkey") === col("pk") &&
              col("unit_cost") === col("min_cost"))
          .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("n_nationkey") === col("s_nationkey"))
          .select(col("l_partkey").as("p_partkey"), col("p_brand"),
            col("s_name"), col("n_name").as("nation"),
            col("s_acctbal"), col("unit_cost"))
          .orderBy(col("s_acctbal").desc, col("nation"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      """WITH li AS (
        |  SELECT l.l_partkey, l.l_suppkey, p.p_brand, l.l_extendedprice, l.l_quantity
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_type = 'ECONOMY' AND p.p_size <= 25),
        |ps AS (
        |  SELECT l_partkey, l_suppkey, p_brand,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) /
        |      CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS unit_cost
        |  FROM li GROUP BY 1, 2, 3),
        |mn AS (SELECT l_partkey AS pk, min(unit_cost) AS min_cost FROM ps GROUP BY 1)
        |SELECT ps.l_partkey AS p_partkey, ps.p_brand, s.s_name, n.n_name AS nation,
        |  s.s_acctbal, ps.unit_cost
        |FROM ps JOIN mn ON mn.pk = ps.l_partkey AND ps.unit_cost = mn.min_cost
        |JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |ORDER BY s.s_acctbal DESC, nation, s.s_name, p_partkey LIMIT 100""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q6 shape (forecast revenue change): the pure scan-
    // aggregate — three sargable predicates (year range pushes to the
    // parquet scan; discount/quantity bounds are row-group-prunable
    // min/max residuals), one exact decimal sum of price×discount
    // (scale 4), zero joins. The shape that measures raw scan + filter
    // + map-side-aggregate throughput.
    "tpch_q6_forecast_revenue" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(decSum(col("l_extendedprice") * col("l_discount"), 4)
            .as("revenue")),
      s"""SELECT ${decSumSql("l_extendedprice * l_discount", 4)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),

    // ------------------------------------------------------------------
    // TPC-H Q11 shape (important stock): per-part value with a
    // global-share HAVING — value > 1.25× the average part value
    // (scale-invariant, unlike the spec's fixed fraction, which would
    // empty out as the part count grows with SF; 1.25 is exactly
    // representable). The global total comes from ONE exact decimal
    // sum over the base scan and the part count from the aggregate's
    // own grain, both crossed in as 1-row broadcasts (J9); the
    // comparison multiplies doubles in identical textual order.
    "tpch_q11_important_parts" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val pv = li.groupBy(col("l_partkey"))
          .agg(decSum(col("l_extendedprice")).as("value"))
          .localCheckpoint() // feeds the count agg AND the filter probe
        val tot = li.agg(decSum(col("l_extendedprice")).as("total"))
        val np = pv.agg(count(lit(1)).as("n_parts"))
        pv.crossJoin(broadcast(tot)).crossJoin(broadcast(np))
          .filter(col("value") * col("n_parts").cast("double") >
            col("total") * lit(1.25))
          .select(col("l_partkey").as("p_partkey"), col("value"))
          .orderBy(col("value").desc, col("p_partkey"))
      },
      s"""WITH pv AS (
         |  SELECT l_partkey, ${decSumSql("l_extendedprice", 2)} AS value
         |  FROM lineitem GROUP BY 1),
         |tot AS (SELECT ${decSumSql("l_extendedprice", 2)} AS total FROM lineitem),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM pv)
         |SELECT l_partkey AS p_partkey, value
         |FROM pv CROSS JOIN tot CROSS JOIN np
         |WHERE value * CAST(n_parts AS DOUBLE) > total * CAST(1.25 AS DOUBLE)
         |ORDER BY value DESC, p_partkey""".stripMargin),

    // ------------------------------------------------------------------
    // INCREMENTAL MV MAINTENANCE (operators.MvMaintain — the data
    // side of the MV story whose read side is MvRewrite): the stored
    // (returnflag, linestatus) partials fold a second batch's partials
    // without touching base fact rows — SUM/COUNT/MIN/MAX are
    // commutative monoids, so fold(mv(F), mv(B)) ≡ mv(F ∪ B) exactly
    // (Gupta & Mumick 1995 self-maintainability for inserts). The
    // batches split on a sargable shipdate boundary (the reference's
    // monthly-file cadence); the oracle states the one-shot full
    // rollup, so a fold that double-counted or dropped a group
    // hash-mismatches.
    "mv_incremental_maintenance" -> QueryDef(
      (s, dir) => {
        def partial(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
            count(lit(1)).as("cnt"),
            min(col("l_quantity").cast("long")).as("min_qty"),
            max(col("l_quantity").cast("long")).as("max_qty"))
        val li = Tables.lineitem(s, dir)
        val cut = to_date(lit("1997-01-01"))
        val stored = partial(li.filter(col("l_shipdate") < cut))
        val delta = partial(li.filter(col("l_shipdate") >= cut))
        graft.operators.MvMaintain.fold(
          stored, delta, keys = Seq("l_returnflag", "l_linestatus"),
          sums = Seq("sum_qty"), counts = Seq("cnt"),
          mins = Seq("min_qty"), maxs = Seq("max_qty"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
        |  CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty
        |FROM lineitem
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ------------------------------------------------------------------
    // INCREMENTAL JOIN-VIEW MAINTENANCE (MvMaintain.joinDelta) — the
    // join sibling of the rollup fold above: a denormalized
    // orders⋈customer view maintained through insert-only deltas on
    // BOTH sides (new orders by date, new customers by key parity)
    // via ΔV = ΔA⋈(B∪ΔB) ∪ A⋈ΔB. The stored view is never re-joined
    // — both delta terms probe with batch-sized sides. The oracle
    // states the one-shot full join, so a delta algebra that dropped
    // or double-counted any term hash-mismatches on the segment
    // rollup over the maintained view.
    "mv_join_delta_maintenance" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val cut = to_date(lit("1997-01-01"))
        val oOld = o.filter(col("o_orderdate") < cut)
        val oNew = o.filter(col("o_orderdate") >= cut)
        val cOld = c.filter(pmod(col("c_custkey"), lit(2)) === 0)
        val cNew = c.filter(pmod(col("c_custkey"), lit(2)) === 1)
        val vOld = oOld.join(cOld, col("o_custkey") === col("c_custkey"))
        graft.operators.MvMaintain
          .joinDelta(vOld, oOld, oNew, cOld, cNew, "o_custkey", "c_custkey")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            decSum(col("o_totalprice")).as("revenue"))
          .orderBy(col("c_mktsegment"))
      },
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
         |  ${decSumSql("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // RUNTIME BLOOM-FILTER semi-join reduction END TO END — the
    // non-partitioned sibling of DPP (mef_star_dpp_prune) and the
    // third planner-evidence gate beside the MV rewrite: with a
    // selective dim filter and a shuffle join, Spark's
    // InjectRuntimeFilter builds a bloom filter from the filtered
    // creation side and pushes might_contain onto the fact scan, so
    // at 100 TB the probe side drops non-matching rows BEFORE the
    // exchange. Local fixtures are below the 10 GB application-side
    // default and tiny dims would broadcast, so the thresholds are
    // pinned for the assertion (set/restore in try/finally); the fn
    // ASSERTS the bloom filter is in the optimized plan and
    // materializes under it, so a planner regression fails the gate.
    "runtime_bloom_semijoin" -> QueryDef(
      (s, dir) => {
        val keys = Seq(
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.optimizer.runtime.bloomFilter.enabled",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        val saved = keys.map(k => k -> s.conf.getOption(k))
        s.conf.set(keys(0), "-1")   // force the shuffle join the rule targets
        s.conf.set(keys(1), "true")
        s.conf.set(keys(2), "0")    // fixtures are far below the 10GB default
        try {
          val out = Tables.lineitem(s, dir)
            .join(Tables.orders(s, dir)
              .filter(col("o_orderpriority") === "1-URGENT"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("l_returnflag"))
            .agg(count(lit(1)).as("n_lines"),
              sum(col("l_quantity").cast("long")).as("sum_qty"))
            .orderBy(col("l_returnflag"))
          val plan = out.queryExecution.optimizedPlan.toString
          require(plan.contains("might_contain"),
            "runtime bloom filter missing from the optimized plan")
          // materialize under the pinned confs so the returned rows
          // flowed through the bloom-filtered plan
          out.localCheckpoint()
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      },
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // Materialized-view rewrite END TO END (plans.MvRewrite — the
    // aggregate navigator; the reference's vista_agregada_mensual
    // intent as an optimizer rule): a (returnflag, linestatus) grain
    // pre-aggregate registers as an MV, then the user-facing query —
    // a COARSER rollup with a residual key filter, written against the
    // FACT — must retarget onto the MV. The fn ASSERTS the rewrite
    // fired (no fact scan survives in the optimized plan), so a
    // regression that silently falls back fails the gate rather than
    // passing on the identical-by-construction answer. Exact-integer
    // partials: sum-of-partials ≡ the oracle's one-level sum.
    "mv_rewrite_rollup" -> QueryDef(
      (s, dir) => {
        val mv = Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
            count(lit(1)).as("cnt"))
          .localCheckpoint()
        graft.plans.MvRewrite.clear() // idempotent re-runs (Bench warms ×4)
        // registration is SCOPED to this query (register → execute →
        // always deregister): a global leftover could serve stale-SF
        // MV data to a later same-JVM run over a different fixture dir
        graft.plans.MvRewrite.withMv(graft.plans.MvDef(
          srcPathTag = "/lineitem",
          keys = Set("l_returnflag", "l_linestatus"),
          sums = Map("l_quantity" -> "sum_qty"),
          countCol = Some("cnt"),
          freshView = () => mv.queryExecution.analyzed)) {
          val out = Tables.lineitem(s, dir)
            .filter(col("l_linestatus") === "F")
            .groupBy(col("l_returnflag"))
            .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
              count(lit(1)).as("n_lines"))
            .orderBy(col("l_returnflag"))
          val paths = graft.plans.MvRewrite
            .scanPaths(out.queryExecution.optimizedPlan)
          require(!paths.exists(_.contains("/lineitem")),
            s"MV rewrite did not fire — the fact scan survived: $paths")
          // materialize WHILE the MV is registered, so the returned
          // rows genuinely flowed through the rewritten plan (the
          // caller's later write re-optimizes from the logical plan)
          out.localCheckpoint()
        }
      },
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem WHERE l_linestatus = 'F'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
