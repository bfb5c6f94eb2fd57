package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{exprs, Money}
import graft.operators.TextOps

/** Data-quality auditing and drift-detection operators: Welch's t-test
  * (unequal-variance mean comparison), CUSUM change detection over a
  * daily series, functional-dependency profiling, Bloom semi-join
  * reduction, corpus n-gram diversity, and readability scoring.
  *
  * Determinism: every double is derived from exact integer/decimal
  * aggregates through +,-,×,÷,sqrt in IDENTICAL textual order on both
  * engines (CLAUDE.md invariants); CUSUM stays in pure BIGINT via the
  * prefix-sum-minus-running-extremum identity, so no recursion and no
  * doubles at all.
  */
object QualityDriftQueries {

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // Welch's unequal-variance t-test between l_quantity of returnflag
    // 'A' vs 'R' — the A/B-test primitive (treatment vs control means)
    // every experimentation pipeline needs. l_quantity is integral, so
    // Σx and Σx² accumulate as plain BIGINTs (exact at ANY scale — the
    // r8-advice fix: the earlier DECIMAL(20,4) x² sum would have
    // crossed the 2^53 decimal→double ceiling around sf50); mean /
    // variance / t / Welch–Satterthwaite df are then derived in one
    // fixed IEEE order. One map-side-combined agg over the fact
    // table — the whole test is a 2-row reduction regardless of scale.
    "welch_t_qty" -> QueryDef(
      (s, dir) => {
        val q = col("l_quantity").cast("long")
        val li = Tables.lineitem(s, dir)
          .filter(col("l_returnflag").isin("A", "R"))
          .groupBy(col("l_returnflag").as("flag"))
          .agg(
            count(lit(1)).as("n"),
            sum(q).cast("double").as("sx"),
            sum(q * q).cast("double").as("sxx"))
        val m = li.select(
          col("flag"), col("n"),
          (col("sx") / col("n").cast("double")).as("mean"),
          ((col("sxx") - col("sx") * (col("sx") / col("n").cast("double"))) /
            (col("n") - 1).cast("double")).as("var"))
        val ab = m.agg(
          max(when(col("flag") === "A", col("n"))).as("n1"),
          max(when(col("flag") === "R", col("n"))).as("n2"),
          max(when(col("flag") === "A", col("mean"))).as("mean1"),
          max(when(col("flag") === "R", col("mean"))).as("mean2"),
          max(when(col("flag") === "A", col("var"))).as("var1"),
          max(when(col("flag") === "R", col("var"))).as("var2"))
        val se1 = col("var1") / col("n1").cast("double")
        val se2 = col("var2") / col("n2").cast("double")
        ab.select(
          col("n1"), col("n2"), col("mean1"), col("mean2"),
          col("var1"), col("var2"),
          ((col("mean1") - col("mean2")) / sqrt(se1 + se2)).as("t_stat"),
          (((se1 + se2) * (se1 + se2)) /
            (se1 * se1 / (col("n1") - 1).cast("double") +
              se2 * se2 / (col("n2") - 1).cast("double"))).as("df"))
      },
      """WITH s AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
        |m AS (
        |  SELECT flag, n, sx / CAST(n AS DOUBLE) AS mean,
        |    (sxx - sx * (sx / CAST(n AS DOUBLE))) / CAST(n - 1 AS DOUBLE) AS var
        |  FROM s),
        |ab AS (
        |  SELECT
        |    max(CASE WHEN flag = 'A' THEN n END) AS n1,
        |    max(CASE WHEN flag = 'R' THEN n END) AS n2,
        |    max(CASE WHEN flag = 'A' THEN mean END) AS mean1,
        |    max(CASE WHEN flag = 'R' THEN mean END) AS mean2,
        |    max(CASE WHEN flag = 'A' THEN var END) AS var1,
        |    max(CASE WHEN flag = 'R' THEN var END) AS var2
        |  FROM m)
        |SELECT n1, n2, mean1, mean2, var1, var2,
        |  (mean1 - mean2) / sqrt(var1 / CAST(n1 AS DOUBLE) + var2 / CAST(n2 AS DOUBLE)) AS t_stat,
        |  ((var1 / CAST(n1 AS DOUBLE) + var2 / CAST(n2 AS DOUBLE)) * (var1 / CAST(n1 AS DOUBLE) + var2 / CAST(n2 AS DOUBLE))) /
        |    ((var1 / CAST(n1 AS DOUBLE)) * (var1 / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE) +
        |     (var2 / CAST(n2 AS DOUBLE)) * (var2 / CAST(n2 AS DOUBLE)) / CAST(n2 - 1 AS DOUBLE)) AS df
        |FROM ab""".stripMargin),

    // ------------------------------------------------------------------
    // CUSUM drift detection over the daily order count (Page 1954):
    // upward drift S⁺_t = P_t − min_{j≤t} P_j and downward drift
    // S⁻_t = max_{j≤t} P_j − P_t, where P is the prefix sum of the
    // integer deviations n_days·n_t − n_total (count scaled by day
    // count so the target "mean" needs no division — everything stays
    // exact BIGINT). The max(0, prev + x) recursion is deliberately
    // restated as prefix-sum minus running extremum — a pure window
    // form, no recursion, no doubles. The day-grain frame is tiny at
    // any scale (the fact-table agg is the only big shuffle), so the
    // unpartitioned ordered window is a non-issue.
    "cusum_drift_orders" -> QueryDef(
      (s, dir) => {
        val d = Tables.orders(s, dir)
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(count(lit(1)).as("n_orders"))
        val tot = d.agg(
          count(lit(1)).as("n_days"), sum(col("n_orders")).as("n_total"))
        val dev = d.crossJoin(broadcast(tot))
          .select(col("day"), col("n_orders"),
            (col("n_days") * col("n_orders") - col("n_total")).as("dev"))
        val w = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dev
          .withColumn("pre", sum(col("dev")).over(w))
          .select(col("day"), col("n_orders"),
            (col("pre") - min(col("pre")).over(w)).as("cusum_up"),
            (max(col("pre")).over(w) - col("pre")).as("cusum_down"))
          .orderBy(col("day"))
      },
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |               CAST(SUM(n_orders) AS BIGINT) AS n_total FROM d),
        |dev AS (
        |  SELECT d.day, d.n_orders,
        |    CAST(tot.n_days * d.n_orders - tot.n_total AS BIGINT) AS dev
        |  FROM d CROSS JOIN tot),
        |p AS (
        |  SELECT day, n_orders,
        |    CAST(SUM(dev) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre
        |  FROM dev)
        |SELECT day, n_orders,
        |  CAST(pre - min(pre) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum_up,
        |  CAST(max(pre) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - pre AS BIGINT) AS cusum_down
        |FROM p ORDER BY day""".stripMargin),

    // ------------------------------------------------------------------
    // Functional-dependency profiling (the TANE/metanome primitive of
    // data-quality tooling): for candidate FDs X→Y, count LHS groups
    // whose RHS is not unique. Each candidate is one distinct-agg over
    // its table — embarrassingly parallel, no cross-candidate state —
    // and the result is 5 audit rows. o_orderkey→o_custkey is the
    // planted PK control (must hold); the others quantify real
    // violations.
    "fd_profile_violations" -> QueryDef(
      (s, dir) => {
        def audit(df: DataFrame, lhs: String, rhs: String, label: String) =
          df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("n_rhs"))
            .agg(
              count(lit(1)).as("n_lhs"),
              count(when(col("n_rhs") > 1, lit(1))).as("n_violating"),
              max(col("n_rhs")).as("max_rhs"))
            .select(lit(label).as("fd"), col("n_lhs"), col("n_violating"),
              col("max_rhs"))
        val rows = Seq(
          audit(Tables.orders(s, dir), "o_orderkey", "o_custkey",
            "orders: o_orderkey -> o_custkey"),
          audit(Tables.lineitem(s, dir), "l_orderkey", "l_suppkey",
            "lineitem: l_orderkey -> l_suppkey"),
          audit(Tables.part(s, dir), "p_brand", "p_type",
            "part: p_brand -> p_type"),
          audit(Tables.customer(s, dir), "c_nationkey", "c_mktsegment",
            "customer: c_nationkey -> c_mktsegment"),
          audit(Tables.part(s, dir), "p_name", "p_brand",
            "part: p_name -> p_brand"))
        rows.reduce(_ unionByName _)
          .withColumn("holds", col("n_violating") === 0)
          .orderBy(col("fd"))
      },
      """WITH c1 AS (
        |  SELECT 'orders: o_orderkey -> o_custkey' AS fd,
        |    CAST(count(*) AS BIGINT) AS n_lhs,
        |    CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT) AS n_violating,
        |    CAST(max(n_rhs) AS BIGINT) AS max_rhs
        |  FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS n_rhs FROM orders GROUP BY 1)),
        |c2 AS (
        |  SELECT 'lineitem: l_orderkey -> l_suppkey' AS fd,
        |    CAST(count(*) AS BIGINT), CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT), CAST(max(n_rhs) AS BIGINT)
        |  FROM (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_rhs FROM lineitem GROUP BY 1)),
        |c3 AS (
        |  SELECT 'part: p_brand -> p_type' AS fd,
        |    CAST(count(*) AS BIGINT), CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT), CAST(max(n_rhs) AS BIGINT)
        |  FROM (SELECT p_brand, count(DISTINCT p_type) AS n_rhs FROM part GROUP BY 1)),
        |c4 AS (
        |  SELECT 'customer: c_nationkey -> c_mktsegment' AS fd,
        |    CAST(count(*) AS BIGINT), CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT), CAST(max(n_rhs) AS BIGINT)
        |  FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_rhs FROM customer GROUP BY 1)),
        |c5 AS (
        |  SELECT 'part: p_name -> p_brand' AS fd,
        |    CAST(count(*) AS BIGINT), CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT), CAST(max(n_rhs) AS BIGINT)
        |  FROM (SELECT p_name, count(DISTINCT p_brand) AS n_rhs FROM part GROUP BY 1)),
        |u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3
        |      UNION ALL SELECT * FROM c4 UNION ALL SELECT * FROM c5)
        |SELECT fd, n_lhs, n_violating, max_rhs, n_violating = 0 AS holds
        |FROM u ORDER BY fd""".stripMargin),

    // ------------------------------------------------------------------
    // Bloom semi-join reduction (the sideways-information-passing /
    // runtime-filter pattern): build a Bloom filter over the BUILDING-
    // segment customer keys, prune the orders scan MAP-SIDE with the
    // native BloomMightContainLong probe, then finish with the exact
    // broadcast join — false positives are eliminated by the join, so
    // the result is bit-identical to the plain semi-join the oracle
    // runs. At 100 TB this is the shape that avoids shuffling the
    // unreduced fact table: the filter rides the broadcast, the probe
    // is a projection-level boolean, and only surviving rows reach the
    // join.
    "bloom_semijoin_reduction" -> QueryDef(
      (s, dir) => {
        val keys = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val bloom = keys.stat.bloomFilter("c_custkey", 20000L, 0.01)
        val bytes = locally {
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          bos.toByteArray
        }
        Tables.orders(s, dir)
          .filter(exprs.bloomMightContainLong(col("o_custkey"), bytes))
          .join(broadcast(keys.withColumnRenamed("c_custkey", "o_custkey")),
            Seq("o_custkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_orders"),
            Money.decSum(col("o_totalprice"), 2).as("revenue"))
          .orderBy(col("o_orderpriority"))
      },
      """WITH keys AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |sj AS (SELECT o.* FROM orders o WHERE o.o_custkey IN (SELECT c_custkey FROM keys))
        |SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS revenue
        |FROM sj GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),

    // ------------------------------------------------------------------
    // Distinct-n diversity (Li et al. 2016's distinct-1/distinct-n
    // corpus metric): per source, distinct/total ratios for unigrams
    // and trigrams — the standard self-repetition screen for generated
    // or template-heavy text. Trigrams come from two window leads over
    // the position-exploded token frame (one shuffle, keyed by doc);
    // the ratios are single divisions over exact counts.
    "distinct_ngram_diversity" -> QueryDef(
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val tri = t
          .withColumn("t1", lead(col("tok"), 1).over(w))
          .withColumn("t2", lead(col("tok"), 2).over(w))
          .filter(col("t2").isNotNull)
          .select(col("source"),
            concat_ws(" ", col("tok"), col("t1"), col("t2")).as("gram"))
        val m1 = t.groupBy(col("source")).agg(
          count(lit(1)).as("total_tokens"),
          countDistinct(col("tok")).as("distinct_tokens"))
        val m3 = tri.groupBy(col("source")).agg(
          count(lit(1)).as("total_3grams"),
          countDistinct(col("gram")).as("distinct_3grams"))
        m1.join(m3, Seq("source"))
          .select(col("source"), col("total_tokens"), col("distinct_tokens"),
            col("total_3grams"), col("distinct_3grams"),
            (col("distinct_tokens").cast("double") /
              col("total_tokens").cast("double")).as("distinct1_ratio"),
            (col("distinct_3grams").cast("double") /
              col("total_3grams").cast("double")).as("distinct3_ratio"))
          .orderBy(col("source"))
      },
      s"""WITH d AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         |t AS (SELECT doc_id, source, i AS pos, toks[i] AS tok
         |      FROM d, unnest(range(1, len(toks) + 1)) r(i)),
         |tri AS (
         |  SELECT a.source, a.tok || ' ' || b.tok || ' ' || c.tok AS gram
         |  FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |           JOIN t c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
         |m3 AS (SELECT source, CAST(count(*) AS BIGINT) AS total_3grams,
         |              CAST(count(DISTINCT gram) AS BIGINT) AS distinct_3grams
         |       FROM tri GROUP BY 1),
         |m1 AS (SELECT source, CAST(count(*) AS BIGINT) AS total_tokens,
         |              CAST(count(DISTINCT tok) AS BIGINT) AS distinct_tokens
         |       FROM t GROUP BY 1)
         |SELECT m1.source, m1.total_tokens, m1.distinct_tokens,
         |  m3.total_3grams, m3.distinct_3grams,
         |  CAST(m1.distinct_tokens AS DOUBLE) / CAST(m1.total_tokens AS DOUBLE) AS distinct1_ratio,
         |  CAST(m3.distinct_3grams AS DOUBLE) / CAST(m3.total_3grams AS DOUBLE) AS distinct3_ratio
         |FROM m1 JOIN m3 ON m1.source = m3.source
         |ORDER BY m1.source""".stripMargin),

    // ------------------------------------------------------------------
    // Flesch reading-ease histogram per source (vowel-group syllable
    // heuristic): words from the shared tokenizer, sentences and
    // syllable groups from regexp_count — all integer counts, then ONE
    // fixed-order double formula per doc and an integer bucket
    // (floor(score/10)). Group-by-bucket keeps the output a bounded
    // histogram instead of per-doc doubles — the aggregate-don't-emit
    // rule for large corpora. Everything is map-side until the final
    // tiny histogram agg.
    "readability_flesch_buckets" -> QueryDef(
      (s, dir) => {
        val d = Tables.documents(s, dir).select(
          col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("w"),
          regexp_count(coalesce(col("text"), lit("")), lit("[.!?]+"))
            .cast("long").as("sen0"),
          regexp_count(lower(coalesce(col("text"), lit(""))), lit("[aeiouy]+"))
            .cast("long").as("syl"))
        val f = d.filter(col("w") > 0)
          .select(col("source"), col("w"),
            when(col("sen0") < 1, lit(1L)).otherwise(col("sen0")).as("sen"),
            col("syl"))
        f.select(col("source"),
            (lit(206.835) -
              lit(1.015) * (col("w").cast("double") / col("sen").cast("double")) -
              lit(84.6) * (col("syl").cast("double") / col("w").cast("double")))
              .as("score"))
          .select(col("source"),
            floor(col("score") / 10.0).cast("long").as("bucket"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("source"), col("bucket"))
      },
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len($toksSql) AS BIGINT) AS w,
         |    CAST(len(regexp_extract_all(coalesce(text, ''), '[.!?]+')) AS BIGINT) AS sen0,
         |    CAST(len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+')) AS BIGINT) AS syl
         |  FROM documents),
         |f AS (
         |  SELECT source, w, CASE WHEN sen0 < 1 THEN 1 ELSE sen0 END AS sen, syl
         |  FROM d WHERE w > 0),
         |sc AS (
         |  SELECT source,
         |    206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(sen AS DOUBLE))
         |            - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)) AS score
         |  FROM f)
         |SELECT source, CAST(floor(score / 10.0) AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM sc GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin),

    // ------------------------------------------------------------------
    // Merkle digest tree over the orders table (16 leaves → 4 inner →
    // root): the replication/anti-entropy primitive — two replicas
    // compare roots, then walk only the differing subtree. Row
    // serialization uses engine-stable string forms only (BIGINT,
    // VARCHAR, DECIMAL(12,2), DATE — never raw doubles or timestamps).
    // Leaf digests are COMMUTATIVE set digests — md5 over (bit_xor of
    // the 63-bit row-hash values, row count) — so per-leaf aggregation
    // state is O(1) at any table size (the r8-advice fix: the earlier
    // sorted-concat leaf collected every row hash into one buffer,
    // linear per-leaf state). Inner levels still hash the ORDERED
    // child concat (bounded fan-in 16 → 4 → 1). Row hashing is
    // map-side and the xor is map-side-combinable, so the whole tree
    // is one partial+final agg per level.
    "merkle_table_digest" -> QueryDef(
      (s, dir) => {
        val rows = Tables.orders(s, dir).select(
          (col("o_orderkey") % 16).as("leaf"),
          md5(concat_ws("|",
            col("o_orderkey").cast("string"),
            col("o_custkey").cast("string"),
            col("o_orderstatus"),
            col("o_totalprice").cast("decimal(12,2)").cast("string"),
            col("o_orderdate").cast("date").cast("string"))).as("rh"))
        val l0 = rows
          .select(col("leaf"), graft.functions.Md5Hash.lower63Col(col("rh")).as("hv"))
          .groupBy(col("leaf"))
          .agg(
            md5(concat_ws("|",
              bit_xor(col("hv")).cast("string"),
              count(lit(1)).cast("string"))).as("h"),
            count(lit(1)).as("n_rows"))
        val l1 = l0.groupBy((col("leaf") / 4).cast("long").as("node"))
          .agg(
            md5(concat_ws("",
              transform(sort_array(collect_list(struct(col("leaf"), col("h")))),
                x => x.getField("h")))).as("h"),
            sum(col("n_rows")).as("n_rows"))
        val root = l1
          .agg(
            md5(concat_ws("",
              transform(sort_array(collect_list(struct(col("node"), col("h")))),
                x => x.getField("h")))).as("h"),
            sum(col("n_rows")).as("n_rows"))
          .select(lit(2).as("level"), lit(0L).as("node"), col("h"),
            col("n_rows"))
        l0.select(lit(0).as("level"), col("leaf").as("node"), col("h"),
            col("n_rows"))
          .unionByName(l1.select(lit(1).as("level"), col("node"), col("h"),
            col("n_rows")))
          .unionByName(root)
          .orderBy(col("level"), col("node"))
      },
      """WITH rows_h AS (
        |  SELECT o_orderkey % 16 AS leaf,
        |    md5(CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' ||
        |        o_orderstatus || '|' || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) || '|' ||
        |        CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS rh
        |  FROM orders),
        |hv AS (
        |  SELECT leaf,
        |    CAST(('0x' || substr(md5(rh), 1, 16))::UBIGINT & 9223372036854775807::UBIGINT AS BIGINT) AS hv
        |  FROM rows_h),
        |l0 AS (
        |  SELECT leaf,
        |    md5(CAST(bit_xor(hv) AS VARCHAR) || '|' || CAST(count(*) AS VARCHAR)) AS h,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM hv GROUP BY 1),
        |l1 AS (
        |  SELECT leaf // 4 AS node, md5(string_agg(h, '' ORDER BY leaf)) AS h,
        |    CAST(SUM(n_rows) AS BIGINT) AS n_rows
        |  FROM l0 GROUP BY 1),
        |root AS (
        |  SELECT md5(string_agg(h, '' ORDER BY node)) AS h, CAST(SUM(n_rows) AS BIGINT) AS n_rows
        |  FROM l1)
        |SELECT CAST(0 AS INT) AS level, CAST(leaf AS BIGINT) AS node, h, n_rows FROM l0
        |UNION ALL SELECT 1, CAST(node AS BIGINT), h, n_rows FROM l1
        |UNION ALL SELECT 2, CAST(0 AS BIGINT), h, n_rows FROM root
        |ORDER BY level, node""".stripMargin),

    // ------------------------------------------------------------------
    // Neyman-optimal stratified sample allocation (n_h ∝ N_h·S_h) of a
    // 1000-row budget across (returnflag, linestatus) strata, finished
    // by largest-remainder apportionment so the allocations sum to
    // exactly 1000. Per-stratum moments are exact decimal sums (the
    // Welch recipe); the cross-strata weight total uses the
    // stratum-sorted fold (collect_list + aggregate ≡ DuckDB
    // list_reduce) — the ordered-fold trick that makes a sum over a
    // BOUNDED set of doubles deterministic. The fact-table agg is the
    // only scan-sized shuffle; everything after runs on ≤ |strata|
    // rows.
    "neyman_allocation" -> QueryDef(
      (s, dir) => {
        // integral l_quantity: Σx / Σx² as plain BIGINTs — exact at any
        // SF (the r8-advice fix; DECIMAL(20,4) x² would cross 2^53 ~sf50)
        val q = col("l_quantity").cast("long")
        val st = Tables.lineitem(s, dir)
          .groupBy(concat(col("l_returnflag"), lit("/"), col("l_linestatus"))
            .as("stratum"))
          .agg(
            count(lit(1)).as("nh"),
            sum(q).cast("double").as("sx"),
            sum(q * q).cast("double").as("sxx"))
        val w = st.select(col("stratum"), col("nh"),
            sqrt((col("sxx") - col("sx") * (col("sx") / col("nh").cast("double"))) /
              (col("nh") - 1).cast("double")).as("sh"))
          .withColumn("wh", col("nh").cast("double") * col("sh"))
        val tot = w
          .agg(sort_array(collect_list(struct(col("stratum"), col("wh")))).as("ws"))
          .select(aggregate(transform(col("ws"), x => x.getField("wh")),
            lit(0.0), (a, x) => a + x).as("wtot"))
        val base = w.crossJoin(broadcast(tot))
          .select(col("stratum"), col("nh"), col("sh"),
            floor(lit(1000.0) * col("wh") / col("wtot")).cast("long").as("n_floor"),
            (lit(1000.0) * col("wh") / col("wtot") -
              floor(lit(1000.0) * col("wh") / col("wtot"))).as("frac"))
        val short = base.agg((lit(1000L) - sum(col("n_floor"))).as("extra"))
        val rk = base.withColumn("r",
          row_number().over(Window.orderBy(col("frac").desc, col("stratum"))))
        rk.crossJoin(broadcast(short))
          .select(col("stratum"), col("nh"), col("sh"),
            (col("n_floor") +
              when(col("r") <= col("extra"), lit(1L)).otherwise(lit(0L)))
              .as("alloc"))
          .orderBy(col("stratum"))
      },
      """WITH st AS (
        |  SELECT l_returnflag || '/' || l_linestatus AS stratum,
        |    CAST(count(*) AS BIGINT) AS nh,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY 1),
        |sd AS (
        |  SELECT stratum, nh,
        |    sqrt((sxx - sx * (sx / CAST(nh AS DOUBLE))) / CAST(nh - 1 AS DOUBLE)) AS sh
        |  FROM st),
        |w AS (SELECT stratum, nh, sh, CAST(nh AS DOUBLE) * sh AS wh FROM sd),
        |tot AS (
        |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE), list(wh ORDER BY stratum)), (a, b) -> a + b) AS wtot
        |  FROM w),
        |base AS (
        |  SELECT w.stratum, w.nh, w.sh,
        |    CAST(floor(1000.0 * w.wh / tot.wtot) AS BIGINT) AS n_floor,
        |    1000.0 * w.wh / tot.wtot - floor(1000.0 * w.wh / tot.wtot) AS frac
        |  FROM w CROSS JOIN tot),
        |short AS (SELECT CAST(1000 - SUM(n_floor) AS BIGINT) AS extra FROM base),
        |rk AS (
        |  SELECT stratum, nh, sh, n_floor, frac,
        |    row_number() OVER (ORDER BY frac DESC, stratum) AS r
        |  FROM base)
        |SELECT rk.stratum, rk.nh, rk.sh,
        |  rk.n_floor + CASE WHEN rk.r <= short.extra THEN 1 ELSE 0 END AS alloc
        |FROM rk CROSS JOIN short
        |ORDER BY stratum""".stripMargin),

    // ------------------------------------------------------------------
    // Inverse-probability-weighted (Horvitz–Thompson) total estimation:
    // a deterministic md5 subsample (~1/8, the hash_sample pattern)
    // per stratum, expansion weight N_h/n_h, estimate Σ_h w_h·S_h
    // against the exact total computed alongside — the
    // estimate-vs-truth harness every sampled pipeline needs. Stratum
    // sums stay integer; each stratum's expansion is one fixed-order
    // double expression; the cross-strata total uses the
    // stratum-sorted fold (bounded set, deterministic).
    // ------------------------------------------------------------------
    // McNemar's paired test (1947) between two document-quality gates
    // on the SAME corpus — the statistically correct way to compare
    // two filters (a two-proportion z-test ignores the pairing): gate
    // A = length (≥25 tokens), gate B = lexical diversity (distinct
    // tokens ≥ half the tokens — compared by exact integer
    // cross-multiplication, never a ratio). χ² = (b−c)²/(b+c) over
    // the discordant cells — exact integers through ONE division.
    // One corpus scan, one 1-row aggregate.
    "mcnemar_filter_compare" -> QueryDef(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            (size(TextOps.tokens(col("text"))) >= 25).as("ga"),
            (size(array_distinct(TextOps.tokens(col("text")))) * 2 >=
              size(TextOps.tokens(col("text")))).as("gb"))
          .agg(
            sum(when(col("ga") && col("gb"), 1L).otherwise(0L)).as("n_both"),
            sum(when(col("ga") && !col("gb"), 1L).otherwise(0L)).as("n_only_a"),
            sum(when(!col("ga") && col("gb"), 1L).otherwise(0L)).as("n_only_b"),
            sum(when(!col("ga") && !col("gb"), 1L).otherwise(0L)).as("n_neither"))
          .withColumn("mcnemar_chi2",
            when(col("n_only_a") + col("n_only_b") > 0,
              ((col("n_only_a") - col("n_only_b")) *
                (col("n_only_a") - col("n_only_b"))).cast("double") /
                (col("n_only_a") + col("n_only_b")).cast("double"))
              .otherwise(lit(0.0))),
      s"""WITH g AS (
         |  SELECT len($toksSql) >= 25 AS ga,
         |    len(list_distinct($toksSql)) * 2 >= len($toksSql) AS gb
         |  FROM documents),
         |ct AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN ga AND gb THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         |    CAST(SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
         |    CAST(SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b,
         |    CAST(SUM(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
         |  FROM g)
         |SELECT n_both, n_only_a, n_only_b, n_neither,
         |  CASE WHEN n_only_a + n_only_b > 0
         |       THEN CAST((n_only_a - n_only_b) * (n_only_a - n_only_b) AS DOUBLE)
         |            / CAST(n_only_a + n_only_b AS DOUBLE)
         |       ELSE CAST(0.0 AS DOUBLE) END AS mcnemar_chi2
         |FROM ct""".stripMargin),

    // ------------------------------------------------------------------
    // Good–Turing frequency re-estimation + Chao1 richness (Good 1953;
    // Chao 1984) — the unseen-vocabulary estimators a corpus census
    // needs before claiming coverage: the frequency-of-frequencies
    // table N_r, the GT re-estimate r* = (r+1)·N_{r+1}/N_r for
    // r = 1..5, the unseen probability mass N_1/N, and
    // Chao1 = V + N_1²/(2·N_2). Two bounded aggregates (token counts →
    // count-of-counts); every statistic is exact integers through
    // single divisions in identical textual order. Corpus-level
    // constants repeat per row (1-row broadcast, J9).
    "good_turing_vocab" -> QueryDef(
      (s, dir) => {
        val counts = Tables.documents(s, dir)
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
          .localCheckpoint() // feeds the N_r table AND the global stats
        val fof = counts.groupBy(col("c").as("r"))
          .agg(count(lit(1)).as("n_r"))
          .localCheckpoint() // feeds rows, the r+1 lookup, and constants
        val tot = counts.agg(count(lit(1)).as("v"), sum(col("c")).as("n"))
        val ones = fof.select(
          sum(when(col("r") === 1, col("n_r")).otherwise(0L)).as("n1"),
          sum(when(col("r") === 2, col("n_r")).otherwise(0L)).as("n2"))
        fof.orderBy(col("r")).limit(5) // the 5 RAREST counts present —
          // the synthetic corpus has no singletons, so a literal r ≤ 5
          // band would be empty; GT re-estimation applies to whatever
          // low-count band the corpus actually has
          .join(fof.select((col("r") - 1).as("r"), col("n_r").as("n_next")),
            Seq("r"), "left")
          .crossJoin(broadcast(tot)).crossJoin(broadcast(ones))
          .select(col("r"), col("n_r"),
            coalesce(col("n_next"), lit(0L)).as("n_next"),
            (((col("r") + 1) * coalesce(col("n_next"), lit(0L)))
              .cast("double") / col("n_r").cast("double")).as("gt_rstar"),
            col("v"), col("n"),
            (col("n1").cast("double") / col("n").cast("double")).as("p0_mass"),
            when(col("n2") > 0,
              col("v").cast("double") +
                (col("n1") * col("n1")).cast("double") /
                  (lit(2L) * col("n2")).cast("double"))
              .otherwise(col("v").cast("double")).as("chao1"))
          .orderBy(col("r"))
      },
      s"""WITH tk AS (SELECT unnest($toksSql) AS tok FROM documents),
         |counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
         |fof AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM counts GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS v, CAST(SUM(c) AS BIGINT) AS n FROM counts),
         |ones AS (
         |  SELECT CAST(coalesce(SUM(CASE WHEN r = 1 THEN n_r ELSE 0 END), 0) AS BIGINT) AS n1,
         |         CAST(coalesce(SUM(CASE WHEN r = 2 THEN n_r ELSE 0 END), 0) AS BIGINT) AS n2
         |  FROM fof)
         |SELECT f.r, f.n_r,
         |  CAST(coalesce(nx.n_r, 0) AS BIGINT) AS n_next,
         |  CAST((f.r + 1) * coalesce(nx.n_r, 0) AS DOUBLE) / CAST(f.n_r AS DOUBLE) AS gt_rstar,
         |  tot.v, tot.n,
         |  CAST(ones.n1 AS DOUBLE) / CAST(tot.n AS DOUBLE) AS p0_mass,
         |  CASE WHEN ones.n2 > 0
         |       THEN CAST(tot.v AS DOUBLE)
         |            + CAST(ones.n1 * ones.n1 AS DOUBLE) / CAST(2 * ones.n2 AS DOUBLE)
         |       ELSE CAST(tot.v AS DOUBLE) END AS chao1
         |FROM (SELECT * FROM fof ORDER BY r LIMIT 5) f
         |LEFT JOIN fof nx ON nx.r = f.r + 1
         |CROSS JOIN tot CROSS JOIN ones
         |ORDER BY f.r""".stripMargin),

    // ------------------------------------------------------------------
    // Propensity-score MATCHING ATT estimate (Rosenbaum & Rubin 1983;
    // greedy 1-NN with replacement) — the causal design the family
    // still lacked beside DiD/IPW/Neyman: each treated customer
    // (placed ≥1 URGENT order) matches the nearest-below control on a
    // deterministic score axis WITHIN its market segment, via ONE
    // AsOfJoin (the union + carry-forward window — a single exchange,
    // no range join). The score is exact integer cents with the
    // customer key in the low digits, so scores are UNIQUE and the
    // greedy match is engine-independent; DuckDB replays it with its
    // native ASOF LEFT JOIN. Outcomes are integral quantity sums; ATT
    // is two single divisions subtracted in identical textual order,
    // over matched pairs only (unmatched treated surface in
    // n_treated − n_matched, never silently dropped).
    "psm_att_estimate" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val co = Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("l_quantity").cast("long")).as("qty"),
            max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
              .as("treated"))
        val u = Tables.customer(s, dir)
          .join(co, col("o_custkey") === col("c_custkey"), "left")
          .select(col("c_custkey"), col("c_mktsegment").as("seg"),
            // cents shifted by 1e9 + the full custkey in the low digits:
            // UNIQUE for any SF with custkey < 1e9 (~SF 6,600 — custkey
            // is 150k·SF); cents ≤ 1e6 so the product tops out ~1e15,
            // well inside Long. A collision would make the greedy
            // nearest-below match tie-dependent across engines.
            ((col("c_acctbal").cast(DecimalType(20, 2)) * 100).cast("long") *
              1000000000L + col("c_custkey") % 1000000000L).as("s"),
            coalesce(col("qty"), lit(0L)).as("qty"),
            coalesce(col("treated"), lit(0)).as("treated"))
          .localCheckpoint() // feeds both arms of the match
        val t = u.filter(col("treated") === 1)
          .select(col("seg"), col("s"), col("qty"))
        val g = u.filter(col("treated") === 0)
          .select(col("seg"), col("s"), col("qty").as("c_qty"))
        graft.operators.AsOfJoin
          .backward(t, g, "seg", "s", Seq("c_qty"))
          .groupBy(col("seg"))
          .agg(
            count(lit(1)).as("n_treated"),
            count(col("c_qty")).as("n_matched"),
            sum(when(col("c_qty").isNotNull, col("qty"))).as("t_qty_matched"),
            sum(col("c_qty")).as("c_qty_matched"))
          .select(col("seg"), col("n_treated"), col("n_matched"),
            coalesce(col("t_qty_matched"), lit(0L)).as("t_qty_matched"),
            coalesce(col("c_qty_matched"), lit(0L)).as("c_qty_matched"),
            when(col("n_matched") > 0,
              col("t_qty_matched").cast("double") /
                col("n_matched").cast("double") -
                col("c_qty_matched").cast("double") /
                  col("n_matched").cast("double"))
              .otherwise(lit(0.0)).as("att"))
          .orderBy(col("seg"))
      },
      """WITH co AS (
        |  SELECT o.o_custkey AS ck,
        |    CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |    max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS treated
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1),
        |u AS (
        |  SELECT c.c_custkey, c.c_mktsegment AS seg,
        |    CAST(CAST(c.c_acctbal AS DECIMAL(20,2)) * 100 AS BIGINT) * 1000000000
        |      + c.c_custkey % 1000000000 AS s,
        |    coalesce(co.qty, 0) AS qty, coalesce(co.treated, 0) AS treated
        |  FROM customer c LEFT JOIN co ON co.ck = c.c_custkey),
        |t AS (SELECT seg, s, qty FROM u WHERE treated = 1),
        |g AS (SELECT seg, s, qty AS c_qty FROM u WHERE treated = 0),
        |m AS (
        |  SELECT t.seg, t.qty, g.c_qty
        |  FROM t ASOF LEFT JOIN g ON t.seg = g.seg AND t.s >= g.s)
        |SELECT seg,
        |  CAST(count(*) AS BIGINT) AS n_treated,
        |  CAST(count(c_qty) AS BIGINT) AS n_matched,
        |  CAST(coalesce(SUM(CASE WHEN c_qty IS NOT NULL THEN qty END), 0) AS BIGINT) AS t_qty_matched,
        |  CAST(coalesce(SUM(c_qty), 0) AS BIGINT) AS c_qty_matched,
        |  CASE WHEN count(c_qty) > 0
        |       THEN CAST(coalesce(SUM(CASE WHEN c_qty IS NOT NULL THEN qty END), 0) AS DOUBLE)
        |              / CAST(count(c_qty) AS DOUBLE)
        |          - CAST(coalesce(SUM(c_qty), 0) AS DOUBLE)
        |              / CAST(count(c_qty) AS DOUBLE)
        |       ELSE CAST(0.0 AS DOUBLE) END AS att
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin),

    "ipw_total_estimate" -> QueryDef(
      (s, dir) => {
        val base = Tables.lineitem(s, dir).select(
          concat(col("l_returnflag"), lit("/"), col("l_linestatus"))
            .as("stratum"),
          col("l_quantity").cast("long").as("qty"),
          md5(concat(col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string"))).as("h"))
        val nh = base.groupBy(col("stratum"))
          .agg(count(lit(1)).as("nh"), sum(col("qty")).as("exact_sum"))
        val samp = base
          .filter(substring(col("h"), 1, 1).isin("0", "1"))
          .groupBy(col("stratum"))
          .agg(count(lit(1)).as("ns"), sum(col("qty")).as("s_sum"))
        val est = nh.join(samp, Seq("stratum"))
          .select(col("stratum"), col("nh"), col("ns"), col("exact_sum"),
            ((col("nh").cast("double") / col("ns").cast("double")) *
              col("s_sum").cast("double")).as("est_h"))
        val tot = est.agg(
            sort_array(collect_list(struct(col("stratum"), col("est_h"))))
              .as("es"),
            sum(col("exact_sum")).as("exact_total"))
          .select(
            aggregate(transform(col("es"), x => x.getField("est_h")),
              lit(0.0), (a, x) => a + x).as("est_total"),
            col("exact_total"))
        est.crossJoin(broadcast(tot))
          .select(col("stratum"), col("nh"), col("ns"), col("exact_sum"),
            col("est_h"), col("est_total"), col("exact_total"))
          .orderBy(col("stratum"))
      },
      """WITH base AS (
        |  SELECT l_returnflag || '/' || l_linestatus AS stratum,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS h
        |  FROM lineitem),
        |nh AS (SELECT stratum, CAST(count(*) AS BIGINT) AS nh,
        |              CAST(SUM(qty) AS BIGINT) AS exact_sum
        |       FROM base GROUP BY 1),
        |samp AS (
        |  SELECT stratum, CAST(count(*) AS BIGINT) AS ns, CAST(SUM(qty) AS BIGINT) AS s_sum
        |  FROM base WHERE substr(h, 1, 1) IN ('0', '1') GROUP BY 1),
        |est AS (
        |  SELECT n.stratum, n.nh, s.ns, n.exact_sum,
        |    (CAST(n.nh AS DOUBLE) / CAST(s.ns AS DOUBLE)) * CAST(s.s_sum AS DOUBLE) AS est_h
        |  FROM nh n JOIN samp s ON s.stratum = n.stratum),
        |tot AS (
        |  SELECT
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(est_h ORDER BY stratum)), (a, b) -> a + b) AS est_total,
        |    CAST(SUM(exact_sum) AS BIGINT) AS exact_total
        |  FROM est)
        |SELECT e.stratum, e.nh, e.ns, e.exact_sum, e.est_h, t.est_total, t.exact_total
        |FROM est e CROSS JOIN tot t ORDER BY e.stratum""".stripMargin),

    // ------------------------------------------------------------------
    // Kaplan–Meier survival over repurchase intervals (first → second
    // order; customers without a second order are right-censored at the
    // dataset horizon). The day-grain risk table is exact integers
    // (at-risk via a 1-preceding running sum); each event day's factor
    // (n−d)/n is one division; the survival curve is the prefix product
    // of the day-sorted factor list, materialized as ONE 1-row array
    // frame and folded per position with `aggregate(slice(...))` — the
    // ordered-fold determinism trick extended to prefix products over a
    // BOUNDED (event-day) domain. First 50 curve points emitted.
    "kaplan_meier_repurchase" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val r = Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 2)
        val horizon = Tables.orders(s, dir)
          .agg(max(col("o_orderdate").cast("date")).as("hz"))
        val first = r.filter(col("rn") === 1).select(col("o_custkey"),
          col("d").as("d1"))
        val second = r.filter(col("rn") === 2).select(col("o_custkey"),
          col("d").as("d2"))
        val u = first.join(second, Seq("o_custkey"), "left")
          .crossJoin(broadcast(horizon))
          .select(
            when(col("d2").isNotNull, datediff(col("d2"), col("d1")))
              .otherwise(datediff(col("hz"), col("d1"))).cast("long").as("dur"),
            when(col("d2").isNotNull, lit(1L)).otherwise(lit(0L)).as("ev"))
        val tot = u.agg(count(lit(1)).as("n0"))
        val dayEv = u.groupBy(col("dur").as("t"))
          .agg(sum(col("ev")).as("d"), count(lit(1)).as("leaving"))
        val wt = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val km0 = dayEv.crossJoin(broadcast(tot))
          .withColumn("n_risk",
            col("n0") - coalesce(sum(col("leaving")).over(wt), lit(0L)))
        val evd = km0.filter(col("d") > 0)
          .select(col("t"), col("d"), col("n_risk"),
            ((col("n_risk") - col("d")).cast("double") /
              col("n_risk").cast("double")).as("term"))
        val agg1 = evd.agg(
          sort_array(collect_list(struct(col("t"), col("d"), col("n_risk"),
            col("term")))).as("rows"))
        agg1.select(posexplode(col("rows")).as(Seq("i", "r")), col("rows"))
          .select(col("r.t").as("t"), col("r.d").as("d"),
            col("r.n_risk").as("n_risk"),
            aggregate(
              transform(slice(col("rows"), lit(1), col("i") + 1),
                x => x.getField("term")),
              lit(1.0), (a, x) => a * x).as("survival"))
          .orderBy(col("t"))
          .limit(50)
      },
      """WITH r AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders),
        |iv AS (
        |  SELECT a.o_custkey, CAST(date_diff('day', a.d, b.d) AS BIGINT) AS dur, 1 AS ev
        |  FROM r a JOIN r b ON b.o_custkey = a.o_custkey AND a.rn = 1 AND b.rn = 2),
        |cen AS (
        |  SELECT a.o_custkey,
        |    CAST(date_diff('day', a.d, (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)) AS BIGINT) AS dur, 0 AS ev
        |  FROM r a LEFT JOIN r b ON b.o_custkey = a.o_custkey AND b.rn = 2
        |  WHERE a.rn = 1 AND b.o_custkey IS NULL),
        |u AS (SELECT dur, ev FROM iv UNION ALL SELECT dur, ev FROM cen),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM u),
        |day_ev AS (
        |  SELECT dur AS t, CAST(SUM(ev) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS leaving
        |  FROM u GROUP BY 1),
        |km0 AS (
        |  SELECT t, d,
        |    CAST(tot.n0 - coalesce(SUM(leaving) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |  FROM day_ev CROSS JOIN tot),
        |ev_days AS (SELECT t, d, n_risk,
        |    (CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS term
        |  FROM km0 WHERE d > 0),
        |agg AS (SELECT list(term ORDER BY t) AS terms, list(t ORDER BY t) AS ts,
        |               list(d ORDER BY t) AS ds, list(n_risk ORDER BY t) AS ns FROM ev_days)
        |SELECT CAST(ts[i] AS BIGINT) AS t, CAST(ds[i] AS BIGINT) AS d, CAST(ns[i] AS BIGINT) AS n_risk,
        |  list_reduce(list_prepend(CAST(1 AS DOUBLE), terms[1:i]), (a, b) -> a * b) AS survival
        |FROM agg, unnest(range(1, len(ts) + 1)) r(i)
        |ORDER BY t LIMIT 50""".stripMargin),

    // ------------------------------------------------------------------
    // Two-proportion z-test (pooled): urgent-order share of BUILDING
    // customers vs the rest — the categorical A/B companion to
    // welch_t_qty. Four exact integers into one fixed-order z formula.
    "ztest_urgent_share" -> QueryDef(
      (s, dir) => {
        val g = Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"))
          .groupBy(when(col("c_mktsegment") === "BUILDING", lit(1))
            .otherwise(lit(0)).as("grp"))
          .agg(count(lit(1)).as("n"),
            count(when(col("o_orderpriority") === "1-URGENT", lit(1)))
              .as("k"))
        val p = g.agg(
          max(when(col("grp") === 1, col("n"))).as("n1"),
          max(when(col("grp") === 1, col("k"))).as("k1"),
          max(when(col("grp") === 0, col("n"))).as("n0"),
          max(when(col("grp") === 0, col("k"))).as("k0"))
        val p1 = col("k1").cast("double") / col("n1").cast("double")
        val p0 = col("k0").cast("double") / col("n0").cast("double")
        val pp = (col("k1") + col("k0")).cast("double") /
          (col("n1") + col("n0")).cast("double")
        p.select(col("n1"), col("k1"), col("n0"), col("k0"),
          p1.as("p1"), p0.as("p0"),
          ((p1 - p0) /
            sqrt(pp * (lit(1.0) - pp) *
              (lit(1.0) / col("n1").cast("double") +
                lit(1.0) / col("n0").cast("double")))).as("z"))
      },
      """WITH j AS (
        |  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS grp,
        |    CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS hit
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
        |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(SUM(hit) AS BIGINT) AS k
        |      FROM j GROUP BY 1),
        |p AS (
        |  SELECT
        |    max(CASE WHEN grp = 1 THEN n END) AS n1, max(CASE WHEN grp = 1 THEN k END) AS k1,
        |    max(CASE WHEN grp = 0 THEN n END) AS n0, max(CASE WHEN grp = 0 THEN k END) AS k0
        |  FROM g)
        |SELECT n1, k1, n0, k0,
        |  CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |  CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
        |  (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE)) /
        |    sqrt((CAST(k1 + k0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)) *
        |         (1.0 - CAST(k1 + k0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)) *
        |         (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n0 AS DOUBLE))) AS z
        |FROM p""".stripMargin),

    // ------------------------------------------------------------------
    // Calibration / reliability bins: a deterministic md5 score in
    // [0, 1000) ppt against the observed en-rate per decile bin — the
    // reliability-diagram primitive for any probabilistic classifier.
    // Map-side score, one bounded-bin agg; rates are one division per
    // bin.
    "calibration_bins" -> QueryDef(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            (conv(substring(md5(concat(lit("cal:"),
              col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") %
              1000).as("score_ppt"),
            when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"))
          .groupBy((col("score_ppt") / 100).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
          .select(col("bin"), col("n"), col("pos"),
            (col("pos").cast("double") / col("n").cast("double"))
              .as("observed_rate"))
          .orderBy(col("bin")),
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5('cal:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS BIGINT) AS h
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(h % 1000 AS BIGINT) AS score_ppt,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM d),
        |b AS (
        |  SELECT CAST(score_ppt // 100 AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
        |  FROM s GROUP BY 1)
        |SELECT bin, n, pos,
        |  CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS observed_rate
        |FROM b ORDER BY bin""".stripMargin),

    // ------------------------------------------------------------------
    // Unicode NFC canonicalization before content keys (the
    // [[graft.functions.NfcNormalize]] kernel, ASCII fast-path): each
    // doc plants a precomposed and a decomposed spelling of the same
    // logical string (é vs e+U+0301, Å vs A+U+030A); raw keys are 2×
    // the canonical keys, and the md5 over the sorted canonical corpus
    // pins the normalizer byte-for-byte against DuckDB's
    // `nfc_normalize` (utf8proc). Normalization is map-side; the audit
    // is one aggregate.
    "nfc_canonical_dedup" -> QueryDef(
      (s, dir) => {
        val id = col("doc_id").cast("string")
        // Spark's chr() is ASCII-mod-256, NOT a Unicode codepoint
        // constructor (DuckDB's is) — plant the non-ASCII fixture
        // chars as Scala escapes instead
        val v = Tables.documents(s, dir).select(col("doc_id"),
          when(col("doc_id") % 2 === 0,
            concat(lit("Café doc "), id))
            .otherwise(concat(lit("Ångstrom doc "), id))
            .as("pre"),
          when(col("doc_id") % 2 === 0,
            concat(lit("Café doc "), id))
            .otherwise(concat(lit("Ångstrom doc "), id))
            .as("dec"))
        val r = v.select(col("pre").as("raw"))
          .unionByName(v.select(col("dec").as("raw")))
        val n = r.select(col("raw"), exprs.nfcNormalize(col("raw")).as("canon"))
        n.agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("raw")).as("n_raw_keys"),
          countDistinct(col("canon")).as("n_nfc_keys"),
          count(when(col("canon") =!= col("raw"), lit(1))).as("n_changed"),
          md5(concat_ws("\n", sort_array(collect_list(col("canon")))))
            .as("canon_md5"))
      },
      """WITH v AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 'Caf' || chr(233) || ' doc ' || CAST(doc_id AS VARCHAR)
        |         ELSE chr(197) || 'ngstrom doc ' || CAST(doc_id AS VARCHAR) END AS pre,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 'Cafe' || chr(769) || ' doc ' || CAST(doc_id AS VARCHAR)
        |         ELSE 'A' || chr(778) || 'ngstrom doc ' || CAST(doc_id AS VARCHAR) END AS dec
        |  FROM documents),
        |r AS (SELECT pre AS raw FROM v UNION ALL SELECT dec FROM v),
        |n AS (SELECT raw, nfc_normalize(raw) AS canon FROM r)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT raw) AS BIGINT) AS n_raw_keys,
        |  CAST(count(DISTINCT canon) AS BIGINT) AS n_nfc_keys,
        |  CAST(count(*) FILTER (WHERE canon <> raw) AS BIGINT) AS n_changed,
        |  md5(string_agg(canon, chr(10) ORDER BY canon)) AS canon_md5
        |FROM n""".stripMargin)
    ,

    // ------------------------------------------------------------------
    // Kruskal–Wallis H across market segments on per-customer total
    // quantity (the k-group generalization of the Mann–Whitney the
    // family already has): pooled average ranks with ties stay
    // INTEGRAL by doubling (avg rank of a tied value = (2·cum + t +
    // 1)/2, so 2·R_i is an exact BIGINT), the cumulative count rides
    // the value-bucketed PrefixSum (never a global window over the
    // value domain), and each group emits its exact (n_i, 2R_i) plus
    // ONE fixed-order double h_term (H = Σ h_term − 3(N+1); the
    // chi2 per-row-term rule — never a SUM over doubles). tie_frac
    // carries the tie correction (divide H by 1 − tie_frac).
    "kruskal_wallis_segments" -> QueryDef(
      (s, dir) => {
        val cv = Tables.customer(s, dir)
          .join(Tables.orders(s, dir),
            col("o_custkey") === col("c_custkey"), "left")
          .join(Tables.lineitem(s, dir),
            col("l_orderkey") === col("o_orderkey"), "left")
          .groupBy(col("c_custkey"), col("c_mktsegment").as("seg"))
          .agg(coalesce(sum(col("l_quantity").cast("long")), lit(0L)).as("v"))
          .localCheckpoint() // feeds the value census AND the group agg
        val n = cv.count()
        val vr = cv.groupBy(col("v")).agg(count(lit(1)).as("t"))
        val r2 = graft.operators.PrefixSum
          .withExclusivePrefix(vr, Seq(col("v")), "t", "cum")
          .select(col("v"), (lit(2L) * col("cum") + col("t") + 1).as("rank2"),
            col("t"))
          .localCheckpoint() // feeds the group join AND the tie total
        val tcorr = r2.agg(
          sum(col("t") * col("t") * col("t") - col("t"))).head().getLong(0)
        cv.join(r2.select(col("v"), col("rank2")), Seq("v"))
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n_i"), sum(col("rank2")).as("r2_sum"))
          .select(col("seg"), col("n_i"), col("r2_sum"),
            (lit(12.0) * (col("r2_sum").cast("double") / lit(2.0)) *
              (col("r2_sum").cast("double") / lit(2.0)) /
              col("n_i").cast("double") / lit(n.toDouble) /
              lit((n + 1).toDouble)).as("h_term"),
            (lit(tcorr.toDouble) /
              (lit(n.toDouble) * lit(n.toDouble) * lit(n.toDouble) -
                lit(n.toDouble))).as("tie_frac"))
          .orderBy(col("seg"))
      },
      """WITH cv AS (
        |  SELECT c.c_custkey, c.c_mktsegment AS seg,
        |    CAST(coalesce(SUM(CAST(l.l_quantity AS BIGINT)), 0) AS BIGINT) AS v
        |  FROM customer c
        |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |vr AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS t,
        |    CAST(2*(SUM(count(*)) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS BIGINT) AS cum2
        |  FROM cv GROUP BY v),
        |r2 AS (SELECT v, (coalesce(cum2, 0) + t + 1) AS rank2, t FROM vr),
        |g AS (
        |  SELECT seg, CAST(count(*) AS BIGINT) AS n_i,
        |    CAST(SUM(r2.rank2) AS BIGINT) AS r2_sum
        |  FROM cv JOIN r2 ON r2.v = cv.v GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cv),
        |tie AS (SELECT CAST(SUM(t*t*t - t) AS BIGINT) AS tcorr FROM vr)
        |SELECT g.seg, g.n_i, g.r2_sum,
        |  12.0 * (CAST(g.r2_sum AS DOUBLE)/2.0) * (CAST(g.r2_sum AS DOUBLE)/2.0)
        |    / CAST(g.n_i AS DOUBLE) / CAST(tot.n AS DOUBLE)
        |    / CAST(tot.n + 1 AS DOUBLE) AS h_term,
        |  CAST(tie.tcorr AS DOUBLE) /
        |    (CAST(tot.n AS DOUBLE)*CAST(tot.n AS DOUBLE)*CAST(tot.n AS DOUBLE)
        |      - CAST(tot.n AS DOUBLE)) AS tie_frac
        |FROM g CROSS JOIN tot CROSS JOIN tie
        |ORDER BY g.seg""".stripMargin),

    // ------------------------------------------------------------------
    // K-ANONYMITY / L-DIVERSITY audit (Sweeney 2002; Machanavajjhala
    // 2007) — the governance gate a training-data release runs before
    // shipping records keyed by quasi-identifiers: group customers by
    // the QI tuple (segment, nation, 1000-unit balance bucket), band
    // group sizes at k=5, and count rows in groups whose SENSITIVE
    // attribute (top order priority) shows no diversity (l < 2 —
    // membership discloses the value). All exact integers; one QI
    // aggregation + one band rollup.
    "k_anonymity_audit" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val qi = Tables.customer(s, dir).select(
          col("c_custkey"),
          col("c_mktsegment").as("seg"),
          col("c_nationkey").as("nat"),
          floor((col("c_acctbal").cast(DecimalType(20, 2)) * 100)
            .cast("long") / lit(100000)).cast("long").as("bal_kbucket"))
        val sens = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("c_custkey"))
          .agg(min(col("o_orderpriority")).as("sensitive"))
        val g = qi.join(sens, Seq("c_custkey"), "left")
          .select(col("seg"), col("nat"), col("bal_kbucket"),
            coalesce(col("sensitive"), lit("NONE")).as("sensitive"))
          .groupBy(col("seg"), col("nat"), col("bal_kbucket"))
          .agg(count(lit(1)).as("grp_n"),
            countDistinct(col("sensitive")).as("l_div"))
        g.groupBy(
            when(col("grp_n") >= 5, lit(5L)).otherwise(col("grp_n"))
              .as("k_band"))
          .agg(count(lit(1)).as("n_groups"),
            sum(col("grp_n")).as("n_rows"),
            sum(when(col("l_div") < 2, col("grp_n")).otherwise(0L))
              .as("rows_low_ldiv"))
          .orderBy(col("k_band"))
      },
      """WITH qi AS (
        |  SELECT c.c_custkey, c.c_mktsegment AS seg, c.c_nationkey AS nat,
        |    CAST(floor(CAST(CAST(c.c_acctbal AS DECIMAL(20,2)) * 100 AS BIGINT)
        |      / 100000) AS BIGINT) AS bal_kbucket
        |  FROM customer c),
        |sens AS (
        |  SELECT o_custkey AS c_custkey, min(o_orderpriority) AS sensitive
        |  FROM orders GROUP BY 1),
        |g AS (
        |  SELECT seg, nat, bal_kbucket,
        |    CAST(count(*) AS BIGINT) AS grp_n,
        |    CAST(count(DISTINCT coalesce(sens.sensitive, 'NONE')) AS BIGINT) AS l_div
        |  FROM qi LEFT JOIN sens USING (c_custkey)
        |  GROUP BY 1, 2, 3)
        |SELECT
        |  CAST(CASE WHEN grp_n >= 5 THEN 5 ELSE grp_n END AS BIGINT) AS k_band,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(grp_n) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN l_div < 2 THEN grp_n ELSE 0 END) AS BIGINT) AS rows_low_ldiv
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // pass@k (Chen et al. 2021, Codex eval) — THE LLM-eval statistic,
    // computed EXACTLY: per task (customers as tasks, orders as
    // attempts, urgent priority as a pass), pass@k = 1 − C(n−c,k)/C(n,k)
    // evaluated as the k-term product Π (n−c−i)/(n−i) — every factor a
    // single exact-integer division, the product a fixed
    // left-associated IEEE chain (no factorials, no lgamma). n−c < k
    // short-circuits to 1.0 (a pass is guaranteed in k draws). Top-20
    // attempt-heavy tasks; per-task rows (the per-row-term rule — the
    // analyst averages however they weight tasks).
    "pass_at_k_eval" -> QueryDef(
      (s, dir) => {
        def passAt(k: Int): org.apache.spark.sql.Column = {
          val prod = (0 until k).map(i =>
            (col("n") - col("c") - lit(i)).cast("double") /
              (col("n") - lit(i)).cast("double"))
            .reduceLeft(_ * _)
          when(col("n") - col("c") < k, lit(1.0))
            .otherwise(lit(1.0) - prod)
        }
        val t = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("task"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
              .as("c"))
        t.filter(col("n") >= 5)
          .orderBy(col("n").desc, col("task")).limit(20)
          .select(col("task"), col("n"), col("c"),
            passAt(1).as("pass_at_1"), passAt(5).as("pass_at_5"))
          .orderBy(col("n").desc, col("task"))
      }, {
        def passAt(k: Int): String = {
          val prod = (0 until k).map(i =>
            s"(CAST(n - c - $i AS DOUBLE) / CAST(n - $i AS DOUBLE))")
            .mkString(" * ")
          s"CASE WHEN n - c < $k THEN 1.0 ELSE 1.0 - $prod END"
        }
        s"""WITH t AS (
           |  SELECT o_custkey AS task, CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c
           |  FROM orders GROUP BY 1),
           |e AS (SELECT task, n, c FROM t WHERE n >= 5
           |      ORDER BY n DESC, task LIMIT 20)
           |SELECT task, n, c,
           |  ${passAt(1)} AS pass_at_1,
           |  ${passAt(5)} AS pass_at_5
           |FROM e ORDER BY n DESC, task""".stripMargin
      }),

    // ------------------------------------------------------------------
    // Wilson score interval per source on the share of above-median-
    // length documents — the CI that behaves at small n and extreme p̂
    // (unlike the Wald interval): low/high = (p̂ + z²/2n ∓
    // z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n) with z = 1.96 and z²
    // spelled as 1.96·1.96 so both engines compute the same bits; the
    // one √ is correctly rounded (IEEE), every other op is ±×÷ in
    // identical textual order. The corpus median rides a 1-row
    // broadcast (J9).
    "wilson_ci_quality" -> QueryDef(
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            TextOps.tokenCount(col("text")).cast("long").as("nt"))
          .localCheckpoint() // feeds the median rank AND the share agg
        val nDocs = d.count()
        val med = d
          .withColumn("r", row_number().over(
            Window.orderBy(col("nt"), col("doc_id"))))
          .filter(col("r") === (nDocs + 1) / 2)
          .select(col("nt").as("m"))
        val g = d.crossJoin(broadcast(med))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("nt") > col("m"), 1L).otherwise(0L)).as("w"))
        val nD = col("n").cast("double")
        val p = col("w").cast("double") / nD
        val z2 = lit(1.96) * lit(1.96)
        val center = p + z2 / (lit(2.0) * nD)
        val rad = lit(1.96) *
          sqrt(p * (lit(1.0) - p) / nD + z2 / (lit(4.0) * nD * nD))
        val denom = lit(1.0) + z2 / nD
        g.select(col("source"), col("n"), col("w"),
            p.as("p_hat"),
            ((center - rad) / denom).as("wilson_low"),
            ((center + rad) / denom).as("wilson_high"))
          .orderBy(col("source"))
      },
      s"""WITH d AS (
         |  SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS nt
         |  FROM documents),
         |med AS (
         |  SELECT nt AS m FROM (
         |    SELECT nt, row_number() OVER (ORDER BY nt, doc_id) AS r FROM d)
         |  WHERE r = (SELECT (count(*) + 1) // 2 FROM d)),
         |g AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN d.nt > med.m THEN 1 ELSE 0 END) AS BIGINT) AS w
         |  FROM d CROSS JOIN med GROUP BY 1)
         |SELECT source, n, w,
         |  CAST(w AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
         |  ((CAST(w AS DOUBLE) / CAST(n AS DOUBLE)) + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
         |   - 1.96 * sqrt((CAST(w AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 - CAST(w AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
         |       + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         |  / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_low,
         |  ((CAST(w AS DOUBLE) / CAST(n AS DOUBLE)) + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
         |   + 1.96 * sqrt((CAST(w AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 - CAST(w AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
         |       + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
         |  / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_high
         |FROM g ORDER BY source""".stripMargin),

    // ------------------------------------------------------------------
    // CUPED variance reduction (Deng et al. 2013, the experimentation
    // workhorse): per segment, the pre-period covariate (1996
    // quantity) explains ρ² of the post-period metric's (1997)
    // variance, so a CUPED-adjusted experiment needs only (1 − ρ²) of
    // the samples. Exact BIGINT moment sums (the corr recipe — small
    // integral measures keep n·sxy under 2^53 at tested SFs); ρ² is
    // squared AFTER the cast so both engines square the same double;
    // one subtraction finishes var_ratio.
    "cuped_variance_reduction" -> QueryDef(
      (s, dir) => {
        val cy = Tables.customer(s, dir)
          .join(Tables.orders(s, dir),
            col("o_custkey") === col("c_custkey"), "left")
          .join(Tables.lineitem(s, dir),
            col("l_orderkey") === col("o_orderkey"), "left")
          .groupBy(col("c_custkey"), col("c_mktsegment").as("seg"))
          .agg(
            coalesce(sum(when(year(col("l_shipdate")) === 1996,
              col("l_quantity").cast("long"))), lit(0L)).as("x"),
            coalesce(sum(when(year(col("l_shipdate")) === 1997,
              col("l_quantity").cast("long"))), lit(0L)).as("y"))
        val m = cy.groupBy(col("seg"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
        m.select(col("seg"), col("n"), col("sx"), col("sy"),
            col("sxy"), col("sxx"), col("syy"),
            (num * num / den).as("rho2"),
            (lit(1.0) - num * num / den).as("var_ratio"))
          .orderBy(col("seg"))
      },
      """WITH cy AS (
        |  SELECT c.c_custkey, c.c_mktsegment AS seg,
        |    CAST(coalesce(SUM(CASE WHEN year(l.l_shipdate) = 1996
        |      THEN CAST(l.l_quantity AS BIGINT) END), 0) AS BIGINT) AS x,
        |    CAST(coalesce(SUM(CASE WHEN year(l.l_shipdate) = 1997
        |      THEN CAST(l.l_quantity AS BIGINT) END), 0) AS BIGINT) AS y
        |  FROM customer c
        |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x*y) AS BIGINT) AS sxy,
        |    CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
        |  FROM cy GROUP BY 1)
        |SELECT seg, n, sx, sy, sxy, sxx, syy,
        |  CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
        |    / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) AS rho2,
        |  1.0 - CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
        |    / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) AS var_ratio
        |FROM m ORDER BY seg""".stripMargin),

    // ------------------------------------------------------------------
    // ROUGE-1/ROUGE-2 recall (Lin 2004, "ROUGE: a package for automatic
    // evaluation of summaries" — public literature) between each
    // document and the NEXT document of its source (cand = ref + 20 in
    // the doc_id-mod-20 source layout): clipped n-gram overlap =
    // Σ_g min(count_cand(g), count_ref(g)) over the ref's n-grams —
    // multiset semantics, all integer counts, recall is the single
    // division. Tokens split on the explicit [\t\n\f\r ] class (the
    // \s-semantics divergence guard); bigrams pair adjacent positions
    // via a per-document window. Everything is keyed by (doc, gram) —
    // the candidate join is an equi-join on (cand_id, gram), no
    // all-pairs stage.
    "rouge_recall_pairs" -> QueryDef(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(expr(
            "filter(split(coalesce(text, ''), '[\\t\\n\\f\\r ]+'), x -> x <> '')"))
            .as(Seq("pos", "tok")))
        val uni = toks.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c"))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val big = toks
          .withColumn("nxt", lead(col("tok"), 1).over(wd))
          .filter(col("nxt").isNotNull)
          .groupBy(col("doc_id"), concat(col("tok"), lit(" "), col("nxt")).as("bg"))
          .agg(count(lit(1)).as("c"))
        val pairs = Tables.documents(s, dir).select(col("doc_id").as("ref_id"))
          .join(Tables.documents(s, dir).select(col("doc_id").as("cand_id")),
            col("cand_id") === col("ref_id") + 20)
        def overlap(grams: org.apache.spark.sql.DataFrame, gcol: String,
            refAlias: String, ovAlias: String) =
          pairs
            .join(grams.select(col("doc_id").as("ref_id"), col(gcol), col("c").as("rc")),
              Seq("ref_id"))
            .join(grams.select(col("doc_id").as("cand_id"), col(gcol), col("c").as("cc")),
              Seq("cand_id", gcol), "left")
            .groupBy(col("ref_id"))
            .agg(sum(col("rc")).as(refAlias),
              sum(least(col("rc"), coalesce(col("cc"), lit(0L)))).as(ovAlias))
        overlap(uni, "tok", "ref_uni", "ov_uni")
          .join(overlap(big, "bg", "ref_big", "ov_big"), Seq("ref_id"))
          .select(col("ref_id"), (col("ref_id") + 20).as("cand_id"),
            col("ref_uni"), col("ov_uni"),
            (col("ov_uni").cast("double") / col("ref_uni").cast("double")).as("rouge1_recall"),
            col("ref_big"), col("ov_big"),
            (col("ov_big").cast("double") / col("ref_big").cast("double")).as("rouge2_recall"))
          .orderBy(col("ref_id"))
      },
      """WITH lists AS (
        |  SELECT doc_id, list_filter(string_split_regex(coalesce(text,''), '[\t\n\f\r ]+'), x -> x <> '') AS ts
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, ts[i] AS tok, i AS pos
        |  FROM lists, unnest(range(1, len(ts) + 1)) AS r(i)),
        |uni AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |big AS (
        |  SELECT a.doc_id, a.tok || ' ' || b.tok AS bg, count(*) AS c
        |  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  GROUP BY 1, 2),
        |pairs AS (SELECT d1.doc_id AS ref_id, d2.doc_id AS cand_id
        |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 20),
        |o1 AS (
        |  SELECT p.ref_id, CAST(sum(r.c) AS BIGINT) AS ref_uni,
        |         CAST(sum(least(r.c, coalesce(c.c, 0))) AS BIGINT) AS ov_uni
        |  FROM pairs p JOIN uni r ON r.doc_id = p.ref_id
        |  LEFT JOIN uni c ON c.doc_id = p.cand_id AND c.tok = r.tok
        |  GROUP BY 1),
        |o2 AS (
        |  SELECT p.ref_id, CAST(sum(r.c) AS BIGINT) AS ref_big,
        |         CAST(sum(least(r.c, coalesce(c.c, 0))) AS BIGINT) AS ov_big
        |  FROM pairs p JOIN big r ON r.doc_id = p.ref_id
        |  LEFT JOIN big c ON c.doc_id = p.cand_id AND c.bg = r.bg
        |  GROUP BY 1)
        |SELECT o1.ref_id, o1.ref_id + 20 AS cand_id, o1.ref_uni, o1.ov_uni,
        |  CAST(o1.ov_uni AS DOUBLE) / CAST(o1.ref_uni AS DOUBLE) AS rouge1_recall,
        |  o2.ref_big, o2.ov_big,
        |  CAST(o2.ov_big AS DOUBLE) / CAST(o2.ref_big AS DOUBLE) AS rouge2_recall
        |FROM o1 JOIN o2 ON o2.ref_id = o1.ref_id
        |ORDER BY o1.ref_id""".stripMargin),

    // ------------------------------------------------------------------
    // Krippendorff's alpha, nominal data (Krippendorff 1970/2004 —
    // public literature), over three deterministic binary "annotators"
    // of document quality (length ≥ 250 chars; ≥ 3 sentence periods;
    // ≥ 40 whitespace tokens — the weak-label recipe). With every unit
    // rated by all m = 3 coders, observed disagreement reduces to
    // Σ_u n1ᵤ·n0ᵤ and expected disagreement to the pooled-margin pair
    // count, so α = 1 − Do/De is exact integer arithmetic until ONE
    // final division (both products stay far below 2⁵³ at any SF —
    // documented bound: n ≤ 5·10⁴ docs ⇒ numerator ≤ 2.3·10¹⁵).
    "krippendorff_alpha_labels" -> QueryDef(
      (s, dir) => {
        val votes = Tables.documents(s, dir).select(
          when(col("n_chars") >= 250, 1L).otherwise(0L).as("a1"),
          when(length(coalesce(col("text"), lit(""))) -
            length(expr("replace(coalesce(text, ''), '.', '')")) >= 3, 1L)
            .otherwise(0L).as("a2"),
          when(size(expr(
            "filter(split(coalesce(text, ''), '[\\t\\n\\f\\r ]+'), x -> x <> '')")) >= 40, 1L)
            .otherwise(0L).as("a3"))
        votes
          .select((col("a1") + col("a2") + col("a3")).as("n1"),
            (lit(3L) - col("a1") - col("a2") - col("a3")).as("n0"))
          .agg(count(lit(1)).as("n_units"), sum(col("n1")).as("tot1"),
            sum(col("n0")).as("tot0"),
            sum(col("n1") * col("n0")).as("do_scaled"))
          .select(col("n_units"), col("tot1"), col("tot0"), col("do_scaled"),
            (lit(1.0) - (col("do_scaled") * (lit(3L) * col("n_units") *
              (lit(3L) * col("n_units") - 1))).cast("double") /
              (lit(3L) * col("n_units") * 2 * col("tot1") * col("tot0"))
                .cast("double")).as("alpha"))
      },
      """WITH votes AS (
        |  SELECT
        |    CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS a1,
        |    CASE WHEN length(coalesce(text,'')) - length(replace(coalesce(text,''), '.', '')) >= 3 THEN 1 ELSE 0 END AS a2,
        |    CASE WHEN len(list_filter(string_split_regex(coalesce(text,''), '[\t\n\f\r ]+'), x -> x <> '')) >= 40 THEN 1 ELSE 0 END AS a3
        |  FROM documents),
        |unit AS (
        |  SELECT CAST(a1 + a2 + a3 AS BIGINT) AS n1, CAST(3 - a1 - a2 - a3 AS BIGINT) AS n0 FROM votes),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_units,
        |         CAST(sum(n1) AS BIGINT) AS tot1, CAST(sum(n0) AS BIGINT) AS tot0,
        |         CAST(sum(n1 * n0) AS BIGINT) AS do_scaled
        |  FROM unit)
        |SELECT n_units, tot1, tot0, do_scaled,
        |  1 - CAST(do_scaled * (3*n_units*(3*n_units - 1)) AS DOUBLE)
        |      / CAST(3*n_units * 2 * tot1 * tot0 AS DOUBLE) AS alpha
        |FROM agg""".stripMargin),

    // ------------------------------------------------------------------
    // Demographic-parity audit of the length-quality gate across
    // languages (Dwork et al. 2012, "Fairness through awareness" —
    // public literature): per-language pass rate of the n_chars ≥ 250
    // rule vs the corpus-wide rate; parity_gap > 0 means the gate
    // over-admits that language. THE curation-bias statistic a
    // multilingual pretraining pipeline must watch — a quality filter
    // tuned on English silently starves other languages (the Gopher/
    // CCNet lesson). One language-keyed aggregate + a broadcast 1-row
    // total; the gap stays in the exact-integer → one-division regime.
    "fairness_parity_langs" -> QueryDef(
      (s, dir) => {
        val g = Tables.documents(s, dir)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("n_chars") >= 250, 1L).otherwise(0L)).as("pos"))
        g.crossJoin(broadcast(
            g.agg(sum(col("n")).as("nt"), sum(col("pos")).as("post"))))
          .select(col("lang"), col("n"), col("pos"),
            (col("pos").cast("double") / col("n").cast("double")).as("pass_rate"),
            (col("pos").cast("double") / col("n").cast("double") -
              col("post").cast("double") / col("nt").cast("double")).as("parity_gap"))
          .orderBy(col("lang"))
      },
      """WITH g AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(pos) AS BIGINT) AS post FROM g)
        |SELECT g.lang, g.n, g.pos,
        |  CAST(g.pos AS DOUBLE) / CAST(g.n AS DOUBLE) AS pass_rate,
        |  CAST(g.pos AS DOUBLE) / CAST(g.n AS DOUBLE)
        |    - CAST(t.post AS DOUBLE) / CAST(t.nt AS DOUBLE) AS parity_gap
        |FROM g CROSS JOIN tot t ORDER BY lang""".stripMargin),

    // ------------------------------------------------------------------
    // Token burstiness (Church & Gale 1995, "Poisson mixtures" —
    // public literature): for the 20 highest-document-frequency
    // tokens, P(count ≥ 2 | count ≥ 1) = df₂/df₁ — the adaptation
    // statistic separating topical/templated tokens (bursty: one
    // occurrence begets more) from function words (Poisson-like).
    // High burstiness on a high-df token flags boilerplate/spam
    // templates a curation pass should inspect. One (token, doc)
    // aggregate + one token aggregate — all integers, one division.
    "token_burstiness" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("c"))
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("df1"),
            sum(when(col("c") >= 2, 1L).otherwise(0L)).as("df2"),
            sum(col("c")).as("tf"))
          .select(col("tok"), col("df1"), col("df2"), col("tf"),
            (col("df2").cast("double") / col("df1").cast("double")).as("burstiness"))
          .orderBy(col("df1").desc, col("tok"))
          .limit(20)
      },
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |pc AS (SELECT tok, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df1,
         |         CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
         |         CAST(sum(c) AS BIGINT) AS tf
         |       FROM pc GROUP BY 1)
         |SELECT tok, df1, df2, tf,
         |  CAST(df2 AS DOUBLE) / CAST(df1 AS DOUBLE) AS burstiness
         |FROM df ORDER BY df1 DESC, tok LIMIT 20""".stripMargin),

    // ------------------------------------------------------------------
    // Lexical richness per source: hapax-legomena ratio (hapax/vocab —
    // Baayen 2001, "Word frequency distributions" — public
    // literature). A source whose hapax share collapses is recycling
    // text (template farms); one whose share balloons is noise/OCR
    // garbage — both ends flag sources for the curation blocklist.
    // One (source, token) aggregate + one source aggregate.
    "hapax_ratio_by_source" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("vocab"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
            sum(col("c")).as("tokens"))
          .select(col("source"), col("vocab"), col("hapax"), col("tokens"),
            (col("hapax").cast("double") / col("vocab").cast("double")).as("hapax_ratio"))
          .orderBy(col("source"))
      },
      s"""WITH tok AS (
         |  SELECT source, unnest($toksSql) AS tok FROM documents),
         |sc AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2)
         |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         |  CAST(sum(c) AS BIGINT) AS tokens,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS hapax_ratio
         |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin),

    // ------------------------------------------------------------------
    // Isotonic calibration by pool-adjacent-violators (Ayer et al.
    // 1955; Zadrozny & Elkan 2002 for classifier calibration — public
    // literature), via PAVA's closed-form max-min characterization:
    // iso(i) = max_{j≤i} min_{k≥i} avg(pos, j..k) — no sequential
    // pooling loop, just interval prefix sums over the BOUNDED
    // 10-bucket score grain (≤ 55 intervals at any SF), so both
    // engines evaluate identical single divisions and take max/min
    // over identical doubles (order-free, bit-exact). Score =
    // n_chars÷50 decile bucket; label = document contains the token
    // 'batch' (noisily monotone in length — the pooled tail is the
    // test). This is the monotone-recalibration stage a quality-score
    // model feeds before thresholding.
    "isotonic_calibration" -> QueryDef(
      (s, dir) => {
        val b = Tables.documents(s, dir)
          .groupBy(expr("least(9, CAST(n_chars AS BIGINT) div 50)").as("bin"))
          .agg(count(lit(1)).as("n"),
            sum(when(array_contains(TextOps.tokens(col("text")), "batch"), 1L)
              .otherwise(0L)).as("pos"))
          .localCheckpoint() // ≤ 10 rows; feeds cum, intervals, output
        val c = b
          .withColumn("cn", sum(col("n")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .withColumn("cp", sum(col("pos")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        val iv = c.select(col("bin").as("j"), col("cn").as("jcn"),
            col("cp").as("jcp"), col("n").as("jn"), col("pos").as("jp"))
          .join(broadcast(c.select(col("bin").as("k"), col("cn").as("kcn"),
            col("cp").as("kcp"))), col("k") >= col("j"))
          .select(col("j"), col("k"),
            (col("kcp") - col("jcp") + col("jp")).as("ip"),
            (col("kcn") - col("jcn") + col("jn")).as("inn"))
        val im = c.select(col("bin").as("i"))
          .join(broadcast(iv), col("j") <= col("i") && col("k") >= col("i"))
          .groupBy(col("i"), col("j"))
          .agg(min(col("ip").cast("double") / col("inn").cast("double")).as("mn"))
          .groupBy(col("i")).agg(max(col("mn")).as("iso_rate"))
        b.join(im, col("i") === col("bin"))
          .select(col("bin"), col("n"), col("pos"),
            (col("pos").cast("double") / col("n").cast("double")).as("raw_rate"),
            col("iso_rate"))
          .orderBy(col("bin"))
      },
      s"""WITH b AS (
         |  SELECT least(9, CAST(n_chars AS BIGINT) // 50) AS bin,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN list_contains($toksSql, 'batch') THEN 1 ELSE 0 END) AS BIGINT) AS pos
         |  FROM documents GROUP BY 1),
         |c AS (
         |  SELECT bin, n, pos,
         |    CAST(sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
         |    CAST(sum(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
         |  FROM b),
         |iv AS (
         |  SELECT j.bin AS j, k.bin AS k,
         |    CAST(k.cp - j.cp + j.pos AS BIGINT) AS ip,
         |    CAST(k.cn - j.cn + j.n AS BIGINT) AS inn
         |  FROM c j JOIN c k ON k.bin >= j.bin),
         |im AS (
         |  SELECT c.bin AS i, iv.j, min(CAST(iv.ip AS DOUBLE) / CAST(iv.inn AS DOUBLE)) AS mn
         |  FROM c JOIN iv ON iv.j <= c.bin AND iv.k >= c.bin
         |  GROUP BY 1, 2),
         |iso AS (SELECT i AS bin, max(mn) AS iso_rate FROM im GROUP BY 1)
         |SELECT b.bin, b.n, b.pos,
         |  CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS raw_rate,
         |  iso.iso_rate
         |FROM b JOIN iso ON iso.bin = b.bin ORDER BY b.bin""".stripMargin),

    // ------------------------------------------------------------------
    // Simpson diversity index per source (Simpson 1949 — public
    // literature): D = 1 − Σc² / N² over the source's token counts —
    // the probability two random token draws differ, the
    // concentration-side complement of hapax_ratio_by_source (low D =
    // a template farm hammering few tokens). Exact integers
    // (Σc² ≤ N² ≤ (10⁷)² < 2⁵³ at sf0.1's ~10⁵ tokens/source;
    // documented bound) until the single division.
    "simpson_diversity_sources" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("source"))
          .agg(sum(col("c")).as("nt"), sum(col("c") * col("c")).as("s2"))
          .select(col("source"), col("nt"), col("s2"),
            ((col("nt") * col("nt") - col("s2")).cast("double") /
              (col("nt") * col("nt")).cast("double")).as("simpson_diversity"))
          .orderBy(col("source"))
      },
      s"""WITH tok AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
         |agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS nt,
         |          CAST(sum(c*c) AS BIGINT) AS s2 FROM sc GROUP BY 1)
         |SELECT source, nt, s2,
         |  CAST(nt*nt - s2 AS DOUBLE) / CAST(nt*nt AS DOUBLE) AS simpson_diversity
         |FROM agg ORDER BY source""".stripMargin),

    // ------------------------------------------------------------------
    // LLM-watermark greenlist detection (Kirchenbauer et al. 2023,
    // "A watermark for large language models" — public literature),
    // the context-free variant: the vocabulary hash-partitions into a
    // green half (first md5 hex digit < '8' — exactly γ = 1/2), and a
    // document's detection statistic is z = (2·green − n)/√n — the
    // one-proportion z against γ under H₀ (no watermark). On organic
    // text z should hug 0; a generator that favored greenlisted tokens
    // drifts positive — this is the corpus-side contamination sweep
    // for watermarked synthetic text. All integers, one correctly-
    // rounded sqrt, one division.
    "watermark_greenlist_score" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n"),
            sum(when(substring(md5(concat(lit("wm_"), col("tok"))), 1, 1) < "8", 1L)
              .otherwise(0L)).as("green"))
          .filter(col("n") > 0)
          .select(col("doc_id"), col("n"), col("green"),
            ((lit(2L) * col("green") - col("n")).cast("double") /
              sqrt(col("n").cast("double"))).as("z"))
          .orderBy(col("doc_id"))
      },
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |g AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN substring(md5('wm_' || tok), 1, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT) AS green
         |  FROM tok GROUP BY 1)
         |SELECT doc_id, n, green,
         |  CAST(2*green - n AS DOUBLE) / sqrt(CAST(n AS DOUBLE)) AS z
         |FROM g WHERE n > 0 ORDER BY doc_id""".stripMargin)
  )

  /** DuckDB twin of TextOps.tokens (a def — `defs` initializes first). */
  private def toksSql =
    "list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), t -> len(t) > 0)"
}
