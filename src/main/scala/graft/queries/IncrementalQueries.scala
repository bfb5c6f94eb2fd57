package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Money
import graft.functions.Money.decSumSql
import graft.operators.{DenseId, HashSample, SaltedAgg, Scd2, SkewJoin, SnapshotDiff}

/** Incremental-load / reproducibility operators as verifiable queries:
  * SCD2 dimension history, snapshot CDC diff, deterministic hash
  * sampling, skew-safe two-stage aggregation. All four are exact
  * (DuckDB-oracled) — the change-log and second snapshot are
  * synthesized deterministically from `orders` so both engines state
  * identical semantics.
  */
object IncrementalQueries {

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // SCD2: orders as a change log of each customer's order priority;
    // consecutive same-priority observations collapse into intervals.
    "scd2_customer_priority" -> QueryDef(
      (s, dir) =>
        Scd2.fromChangeLog(
          Tables.orders(s, dir),
          keyCols = Seq("o_custkey"),
          attrCols = Seq("o_orderpriority"),
          tsCol = "o_orderdate",
          tieBreak = Seq("o_orderkey"))
          .select(
            col("o_custkey"), col("o_orderpriority"),
            col("valid_from"), col("valid_to"),
            col("is_current").cast("int").as("is_current"))
          .orderBy(col("o_custkey"), col("valid_from"), col("o_orderpriority")),
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |    lag(o_orderpriority) OVER w AS prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |), changes AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
        |  FROM ordered
        |  WHERE prev IS NULL OR o_orderpriority <> prev
        |)
        |SELECT o_custkey, o_orderpriority,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w2 AS valid_to,
        |  CAST(lead(o_orderdate) OVER w2 IS NULL AS INT) AS is_current
        |FROM changes
        |WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderpriority""".stripMargin),

    // ------------------------------------------------------------------
    // POINT-IN-TIME join over the SCD2 dimension — THE warehouse read
    // pattern SCD2 exists for: each shipment looks up the customer's
    // priority version IN FORCE on its ship date (orders change
    // priority between order and ship, so this is a real temporal
    // lookup, not the defining row). One AsOfJoin (union +
    // carry-forward window — a single exchange, no range join);
    // same-day version collisions collapse to max-priority FIRST so
    // the as-of key is unique and the match engine-independent.
    // DuckDB replays with its native ASOF LEFT JOIN (the psm recipe).
    "scd2_point_in_time_join" -> QueryDef(
      (s, dir) => {
        val versions = Scd2.fromChangeLog(
            Tables.orders(s, dir),
            keyCols = Seq("o_custkey"),
            attrCols = Seq("o_orderpriority"),
            tsCol = "o_orderdate",
            tieBreak = Seq("o_orderkey"))
          .groupBy(col("o_custkey"), col("valid_from").as("ts"))
          .agg(max(col("o_orderpriority")).as("prio"))
        val shipments = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey"), col("l_shipdate").cast("date").as("ts"),
            col("l_quantity").cast("long").as("q"))
        graft.operators.AsOfJoin
          .backward(shipments, versions, "o_custkey", "ts", Seq("prio"))
          .groupBy(coalesce(col("prio"), lit("NONE")).as("prio_in_force"))
          .agg(count(lit(1)).as("n_items"), sum(col("q")).as("sum_qty"))
          .orderBy(col("prio_in_force"))
      },
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |    lag(o_orderpriority) OVER w AS prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |changes AS (
        |  SELECT o_custkey, o_orderdate, o_orderpriority
        |  FROM ordered WHERE prev IS NULL OR o_orderpriority <> prev),
        |v AS (
        |  SELECT o_custkey, o_orderdate AS vf,
        |    max(o_orderpriority) AS prio
        |  FROM changes GROUP BY 1, 2),
        |li AS (
        |  SELECT o.o_custkey AS ck, CAST(l.l_shipdate AS DATE) AS ts,
        |    CAST(l.l_quantity AS BIGINT) AS q
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |m AS (
        |  SELECT li.q, v.prio
        |  FROM li ASOF LEFT JOIN v ON li.ck = v.o_custkey AND li.ts >= v.vf)
        |SELECT coalesce(prio, 'NONE') AS prio_in_force,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(q) AS BIGINT) AS sum_qty
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // COHORT RETENTION MATRIX — the product-analytics read every
    // event warehouse serves: users cohort by FIRST-ACTIVE day, and
    // each (cohort, weeks-since) cell counts distinct still-active
    // users over the cohort's size (exact integers; one division per
    // cell). Two aggregations + one join, all keyed on user/cohort —
    // the same shape at any event volume.
    "cohort_retention_matrix" -> QueryDef(
      (s, dir) => {
        val ue = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
          .localCheckpoint() // feeds the cohort min AND the activity join
        val coh = ue.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
          .localCheckpoint() // feeds the activity join AND the size agg
        val r = ue.join(coh, Seq("user_id"))
          .groupBy(col("cohort"),
            (datediff(col("d"), col("cohort")) / 7).cast("long").as("offs_week"))
          .agg(countDistinct(col("user_id")).as("n_active"))
        val cs = coh.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
        r.join(cs, Seq("cohort"))
          .select(col("cohort"), col("offs_week"), col("n_active"),
            col("n_cohort"),
            (col("n_active").cast("double") / col("n_cohort").cast("double"))
              .as("retention"))
          .orderBy(col("cohort"), col("offs_week"))
      },
      """WITH ue AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |coh AS (SELECT user_id, min(d) AS cohort FROM ue GROUP BY 1),
        |r AS (
        |  SELECT coh.cohort,
        |    CAST((ue.d - coh.cohort) // 7 AS BIGINT) AS offs_week,
        |    CAST(count(DISTINCT ue.user_id) AS BIGINT) AS n_active
        |  FROM ue JOIN coh USING (user_id) GROUP BY 1, 2),
        |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
        |       FROM coh GROUP BY 1)
        |SELECT r.cohort, r.offs_week, r.n_active, cs.n_cohort,
        |  CAST(r.n_active AS DOUBLE) / CAST(cs.n_cohort AS DOUBLE) AS retention
        |FROM r JOIN cs USING (cohort)
        |ORDER BY r.cohort, r.offs_week""".stripMargin),

    // ------------------------------------------------------------------
    // CDC snapshot diff: old = orders through 1996; new = through 1997
    // with deterministic updates (price+1 where key%7=0) and deletes
    // (key%13=0 dropped). Inserted/updated/deleted keys classified via
    // one full outer join; unchanged rows omitted.
    "snapshot_diff_orders" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val oldSnap = o.filter(col("o_orderdate") <= lit("1996-12-31").cast("date"))
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        val newSnap = o.filter(col("o_orderdate") <= lit("1997-12-31").cast("date")
            && col("o_orderkey") % 13 =!= 0)
          .select(
            col("o_orderkey"),
            when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")).as("o_totalprice"),
            col("o_orderstatus"))
        SnapshotDiff.diff(oldSnap, newSnap,
          keyCols = Seq("o_orderkey"),
          compareCols = Seq("o_totalprice", "o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      """WITH old AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |  WHERE o_orderdate <= DATE '1996-12-31'
        |), new AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus
        |  FROM orders
        |  WHERE o_orderdate <= DATE '1997-12-31' AND o_orderkey % 13 <> 0
        |), classified AS (
        |  SELECT COALESCE(new.o_orderkey, old.o_orderkey) AS o_orderkey,
        |    CASE WHEN old.o_orderkey IS NULL THEN 'I'
        |         WHEN new.o_orderkey IS NULL THEN 'D'
        |         WHEN new.o_totalprice <> old.o_totalprice
        |           OR new.o_orderstatus <> old.o_orderstatus THEN 'U'
        |    END AS change_type,
        |    new.o_totalprice, new.o_orderstatus
        |  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
        |)
        |SELECT * FROM classified WHERE change_type IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin),

    // ------------------------------------------------------------------
    // Deterministic hash sample: ~10% of orders by md5(key) threshold —
    // the same rows on any engine, cluster size, or run.
    "hash_sample_orders" -> QueryDef(
      (s, dir) =>
        HashSample.sample(Tables.orders(s, dir), Seq("o_orderkey"), fraction = 0.1)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey")),
      s"""SELECT o_orderkey, o_totalprice FROM orders
         |WHERE md5(CAST(o_orderkey AS VARCHAR)) < '${HashSample.thresholdHex(0.1)}'
         |ORDER BY o_orderkey""".stripMargin),

    // ------------------------------------------------------------------
    // Train/val/test split assignment: each doc's split is a pure
    // function of md5(doc_id) vs cumulative cut points (80/10/10) —
    // reproducible across engines and cluster sizes, and stable under
    // appends (new docs never move old docs between splits). Verified
    // through per-(split, source) counts, char sums, and id extrema:
    // any single reassigned row shifts at least two groups.
    "split_assignment_docs" -> QueryDef(
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("split", HashSample.assignSplits(
            col("doc_id"), Seq("train" -> 0.8, "val" -> 0.9), rest = "test"))
          .groupBy(col("split"), col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
          .orderBy(col("split"), col("source")),
      s"""SELECT
         |  ${HashSample.assignSplitsSql(
               "doc_id", Seq("train" -> 0.8, "val" -> 0.9), rest = "test")} AS split,
         |  source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM documents
         |GROUP BY 1, 2
         |ORDER BY split, source""".stripMargin),

    // ------------------------------------------------------------------
    // Skew-safe two-stage aggregation: bit-identical to the direct
    // groupBy for decomposable aggregates (quantity is integer-valued).
    "salted_agg_pricing" -> QueryDef(
      (s, dir) =>
        SaltedAgg.saltedAgg(
          Tables.lineitem(s, dir),
          keys = Seq("l_returnflag", "l_linestatus"),
          aggs = Seq(
            SaltedAgg.Sum("l_quantity", "sum_qty"),
            SaltedAgg.Count("n_rows"),
            SaltedAgg.Min("l_shipdate", "min_ship"),
            SaltedAgg.Max("l_shipdate", "max_ship")),
          salt = 16)
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  COUNT(*) AS n_rows,
        |  MIN(l_shipdate) AS min_ship,
        |  MAX(l_shipdate) AS max_ship
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // ------------------------------------------------------------------
    // Manual salted skewed join: the hot-key fallback when skew hides
    // from AQE. Semantics must equal the plain equi-join exactly —
    // that is what the oracle states (a plain join+agg). The salt
    // spreads each key over 8 reducers; decimal sums keep the revenue
    // aggregate order-insensitive so the 8-way split can't perturb it.
    "skewjoin_priority_revenue" -> QueryDef(
      (s, dir) => {
        val big = Tables.lineitem(s, dir).select(
          col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val small = Tables.orders(s, dir).select(
          col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        SkewJoin.saltedJoin(big, small, "l_orderkey", salt = 8)
          .groupBy(col("o_orderpriority"))
          .agg(
            Money.decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("o_orderpriority"))
      },
      s"""SELECT o_orderpriority,
         |  ${decSumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin),

    // ------------------------------------------------------------------
    // Scalable dense surrogate ids: range-repartition + zipWithIndex,
    // no global window — ids equal row_number() OVER (ORDER BY key)
    // because c_custkey is unique (total order).
    "dense_id_customers" -> QueryDef(
      (s, dir) =>
        DenseId.withDenseId(
          Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
          Seq(col("c_custkey")), "rid")
          .orderBy(col("rid")),
      """SELECT c_custkey, c_name,
        |  CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS rid
        |FROM customer
        |ORDER BY rid""".stripMargin),

    // ------------------------------------------------------------------
    // The HLL/approx-quantile SKETCH profile lives in SketchSpec only
    // (approx results have no SQL twin; the spec bounds sketch error
    // against this oracled exact profile), so every row the driver
    // gate sees is hash-comparable: exact distinct users (own pass —
    // never mixed with plain aggregates, the (D+1)×
    // Expand lesson) and exact p50/p90 via the value HISTOGRAM +
    // division-free k·cum ≥ m·total crossing (no float division, no
    // row-level window: `value` saturates to a bounded domain, so the
    // per-type window runs over histogram-sized frames at any corpus
    // size). SketchSpec bounds the sketch profile's error against
    // THIS query's exact columns.
    "exact_event_profile" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"), col("user_id"), col("value"))
        val du = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"))
        val hist = ev.groupBy(col("event_type"), col("value"))
          .agg(count(lit(1)).as("c"))
        val cum = hist
          .withColumn("cum", sum(col("c")).over(
            Window.partitionBy(col("event_type")).orderBy(col("value"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("total", sum(col("c")).over(
            Window.partitionBy(col("event_type"))))
        val p50 = cum.filter(col("cum") * 2 >= col("total"))
          .groupBy(col("event_type")).agg(min(col("value")).as("value_p50"))
        val p90 = cum.filter(col("cum") * 10 >= col("total") * 9)
          .groupBy(col("event_type")).agg(min(col("value")).as("value_p90"))
        du.join(p50, Seq("event_type")).join(p90, Seq("event_type"))
          .orderBy(col("event_type"))
      },
      """WITH h AS (
        |  SELECT event_type, value, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, value, c,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY value
        |                 ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS total
        |  FROM h),
        |p50 AS (SELECT event_type, MIN(value) AS value_p50
        |        FROM cum WHERE cum*2 >= total GROUP BY 1),
        |p90 AS (SELECT event_type, MIN(value) AS value_p90
        |        FROM cum WHERE cum*10 >= total*9 GROUP BY 1),
        |du AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |       FROM events GROUP BY 1)
        |SELECT du.event_type, n_users, value_p50, value_p90
        |FROM du JOIN p50 USING (event_type) JOIN p90 USING (event_type)
        |ORDER BY event_type""".stripMargin)
  )
}
