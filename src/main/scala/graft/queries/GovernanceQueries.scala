package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.exprs
import graft.operators.TextOps

/** Corpus-governance operators, oracle-verified: lexicon-scale
  * blocklist matching (one shared Aho–Corasick scan instead of
  * |patterns| regex passes), the Gopher document-quality rule set
  * (Rae et al. 2021, public literature), k-anonymity suppression of a
  * quasi-identifier release, and differentially-private noisy counts
  * via the binomial mechanism (Dwork et al. 2006 shape, with
  * hash-seeded deterministic noise so both engines replay the draw).
  * These are the policy/safety steps a training-data pipeline runs
  * between curation and release — all map-side or one-aggregation
  * shapes that scale with the scan.
  */
object GovernanceQueries {

  private val toksSql =
    "list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), t -> len(t) > 0)"

  /** Blocklist lexicon for the documents fixture — includes a
    * self-overlapping pattern ("a a" occurs twice in "a a a"), a
    * pattern that is a proper suffix of another ("value" inside
    * "hash value" — exercises the automaton's output links), and
    * multi-word phrases.
    */
  private val blockPatterns: Seq[String] = Seq(
    "a a", "fast fast", "hash value", "merge batch",
    "row scan", "spark", "table part", "value")

  private val stopList: Seq[String] =
    Seq("the", "a", "of", "to", "and", "that", "with", "for")

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // Multi-pattern blocklist census via ONE Aho–Corasick automaton
    // scan per document (MultiPatternCount kernel): per pattern, how
    // many documents hit it and how many total occurrences exist —
    // overlapping occurrences and suffix-of-another-pattern hits
    // included, which per-pattern LIKE/regex passes either miss or pay
    // |patterns| scans for. The automaton ships inside the plan
    // (lexicon = literals), matching is map-only; the DuckDB twin
    // replays occurrences with an exhaustive per-position substring
    // scan, proving the automaton exact.
    "blocklist_ahocorasick" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val hits = Tables.documents(s, dir)
          .select(posexplode(
            exprs.multiPatternCount(col("text"), blockPatterns)))
          .toDF("pid", "n")
          .filter(col("n") > 0)
          .groupBy(col("pid"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_hits"))
        val pats = blockPatterns.zipWithIndex
          .map { case (p, i) => (i, p) }.toDF("pid", "pattern")
        pats.join(hits, Seq("pid"), "left")
          .select(
            col("pattern"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .orderBy(col("pattern"))
      }, {
        val values = blockPatterns.zipWithIndex
          .map { case (p, i) => s"($i, '$p')" }.mkString(", ")
        s"""WITH pats(pid, pattern) AS (VALUES $values),
           |pos AS (
           |  SELECT d.doc_id, p.pid
           |  FROM documents d, pats p,
           |    LATERAL (SELECT unnest(range(1, len(coalesce(d.text, '')) - len(p.pattern) + 2)) AS i) g
           |  WHERE substr(coalesce(d.text, ''), g.i, len(p.pattern)) = p.pattern),
           |agg AS (SELECT pid, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |               CAST(count(*) AS BIGINT) AS n_hits
           |        FROM pos GROUP BY 1)
           |SELECT p.pattern,
           |  CAST(coalesce(a.n_docs, 0) AS BIGINT) AS n_docs,
           |  CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits
           |FROM pats p LEFT JOIN agg a ON p.pid = a.pid
           |ORDER BY p.pattern""".stripMargin
      }),

    // ------------------------------------------------------------------
    // Gopher quality rules (Rae et al. 2021 §A1.1, adapted to the
    // fixture's scale): word-count bounds, mean-word-length bounds,
    // alphabetic-word fraction, stopword presence, symbol-to-word
    // ratio. Every rule is exact-integer — ratio thresholds compare by
    // CROSS-MULTIPLICATION (3·words ≤ chars, 5·alpha ≥ 4·words,
    // 10·symbols ≤ words), so no division ever happens and the verdict
    // is bit-exact by construction. Map-only per document.
    "gopher_quality_rules" -> QueryDef(
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            size(toks).cast("long").as("n_words"),
            length(regexp_replace(coalesce(col("text"), lit("")),
              lit("[\\t\\n\\f\\r ]"), lit(""))).cast("long").as("n_word_chars"),
            size(filter(toks, t => t.rlike("[a-z]")))
              .cast("long").as("n_alpha_words"),
            size(filter(toks, t => t.isin(stopList: _*)))
              .cast("long").as("n_stop"),
            regexp_count(coalesce(col("text"), lit("")),
              lit("(\\.\\.\\.|#)")).cast("long").as("n_sym"))
          .withColumn("passes",
            col("n_words").between(20, 1000) &&
              lit(3) * col("n_words") <= col("n_word_chars") &&
              col("n_word_chars") <= lit(10) * col("n_words") &&
              lit(5) * col("n_alpha_words") >= lit(4) * col("n_words") &&
              col("n_stop") >= 2 &&
              lit(10) * col("n_sym") <= col("n_words"))
          .orderBy(col("doc_id"))
      },
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks,
         |    CAST(len(regexp_replace(coalesce(text, ''), '[\\t\\n\\f\\r ]', '', 'g')) AS BIGINT) AS n_word_chars,
         |    CAST(len(regexp_extract_all(coalesce(text, ''), '(\\.\\.\\.|#)')) AS BIGINT) AS n_sym
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    n_word_chars,
         |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha_words,
         |    CAST(len(list_filter(toks, x -> x IN (${stopList.map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS n_stop,
         |    n_sym
         |  FROM t)
         |SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_stop, n_sym,
         |  (n_words BETWEEN 20 AND 1000
         |   AND 3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words
         |   AND 5 * n_alpha_words >= 4 * n_words
         |   AND n_stop >= 2
         |   AND 10 * n_sym <= n_words) AS passes
         |FROM c ORDER BY doc_id""".stripMargin),

    // ------------------------------------------------------------------
    // k-anonymity suppression (Sweeney 2002, public literature) of the
    // customer quasi-identifier release (nation, market segment,
    // balance sign): any equivalence class smaller than k=8 is
    // suppressed into a single '*' residual row, so no released row
    // describes fewer than 8 people. One aggregation at the
    // quasi-identifier grain + a broadcast-free split — the governance
    // gate run before publishing any demographic rollup of a corpus.
    "k_anonymity_suppress" -> QueryDef(
      (s, dir) => {
        val g = Tables.customer(s, dir)
          .groupBy(
            col("c_nationkey").cast("string").as("nation"),
            col("c_mktsegment").as("segment"),
            when(col("c_acctbal") < 0, "neg").otherwise("nonneg")
              .as("bal_class"))
          .agg(count(lit(1)).as("n"))
        val kept = g.filter(col("n") >= 8)
        val suppressed = g.filter(col("n") < 8)
          .agg(coalesce(sum(col("n")), lit(0L)).as("n"))
          .select(lit("*").as("nation"), lit("*").as("segment"),
            lit("*").as("bal_class"), col("n"))
        kept.unionByName(suppressed)
          .orderBy(col("nation"), col("segment"), col("bal_class"))
      },
      """WITH g AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS nation, c_mktsegment AS segment,
        |    CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END AS bal_class,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT nation, segment, bal_class, n FROM g WHERE n >= 8
        |UNION ALL
        |SELECT '*', '*', '*', CAST(coalesce(SUM(n), 0) AS BIGINT) FROM g WHERE n < 8
        |ORDER BY nation, segment, bal_class""".stripMargin),

    // ------------------------------------------------------------------
    // Payment-card PII detection with Luhn VERIFICATION (LuhnCheck
    // kernel): 13-19 digit runs are only candidates — the ISO 7812
    // checksum separates real card numbers from arbitrary numerics,
    // killing the false-positive flood a bare digit-run regex
    // produces. The fixture has no digits, so the corpus is salted
    // with deterministic doc_id-derived numbers (a known-valid card,
    // a known-invalid run, and a doc_id-dependent run whose validity
    // the checksum actually has to decide) — the line_dedup salting
    // recipe, identical on both engines. Map-only per document.
    "pii_luhn_filter" -> QueryDef(
      (s, dir) => {
        val salted = Tables.documents(s, dir).select(
          col("doc_id"),
          concat(coalesce(col("text"), lit("")),
            when(col("doc_id") % 4 === 0, lit(" 4532015112830366"))
              .when(col("doc_id") % 4 === 1, lit(" 1234567890123456"))
              .when(col("doc_id") % 4 === 2,
                concat(lit(" 99"), lpad(col("doc_id").cast("string"), 14, "0")))
              .otherwise(lit(""))).as("text"))
        salted
          .select(col("doc_id"),
            regexp_extract_all(col("text"), lit("[0-9]{13,19}"), lit(0))
              .as("cands"))
          .select(col("doc_id"),
            size(col("cands")).cast("long").as("n_candidates"),
            size(filter(col("cands"), c => exprs.luhnCheck(c)))
              .cast("long").as("n_valid"))
          .withColumn("has_pii", col("n_valid") > 0)
          .orderBy(col("doc_id"))
      },
      """WITH salted AS (
        |  SELECT doc_id, coalesce(text, '') ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' 4532015112830366'
        |         WHEN doc_id % 4 = 1 THEN ' 1234567890123456'
        |         WHEN doc_id % 4 = 2 THEN ' 99' || lpad(CAST(doc_id AS VARCHAR), 14, '0')
        |         ELSE '' END AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, regexp_extract_all(text, '[0-9]{13,19}') AS cands FROM salted),
        |v AS (
        |  SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_candidates,
        |    CAST(len(list_filter(cands, c ->
        |      list_sum(list_transform(range(1, len(c) + 1), i ->
        |        CASE WHEN (len(c) - i) % 2 = 1
        |             THEN CASE WHEN 2 * CAST(c[i] AS INT) > 9
        |                       THEN 2 * CAST(c[i] AS INT) - 9
        |                       ELSE 2 * CAST(c[i] AS INT) END
        |             ELSE CAST(c[i] AS INT) END)) % 10 = 0)) AS BIGINT) AS n_valid
        |  FROM c)
        |SELECT doc_id, n_candidates, n_valid, n_valid > 0 AS has_pii
        |FROM v ORDER BY doc_id""".stripMargin),

    // ------------------------------------------------------------------
    // Differentially-private noisy counts via the BINOMIAL mechanism:
    // noise = popcount(120 hash bits) − 60 ~ Binomial(120,½) centered —
    // the integer-valued DP mechanism (Dwork-Kenthapadi-McSherry-
    // Mironov-Naor 2006 shape), with the draw seeded from md5 of the
    // group key so both engines replay it bit-exactly (the engine's
    // standard derandomized-sampling trick, cf. temperature sampling).
    // The per-group noise is computed AT the group grain (20 rows) —
    // map-side aggregation plus 20 hash evaluations, nothing
    // data-proportional.
    "dp_noisy_counts" -> QueryDef(
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("h", md5(concat(lit("dp:"), col("source"))))
          .withColumn("noise",
            (bit_count(conv(substring(col("h"), 1, 15), 16, 10).cast("long")) +
              bit_count(conv(substring(col("h"), 17, 15), 16, 10).cast("long")) -
              60).cast("long"))
          .select(col("source"), col("n_docs"), col("noise"),
            (col("n_docs") + col("noise")).as("noisy_n"))
          .orderBy(col("source")),
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY 1),
        |n AS (SELECT source, n_docs,
        |  CAST(bit_count(('0x' || substr(md5('dp:' || source), 1, 15))::UBIGINT)
        |     + bit_count(('0x' || substr(md5('dp:' || source), 17, 15))::UBIGINT)
        |     - 60 AS BIGINT) AS noise
        |  FROM g)
        |SELECT source, n_docs, noise, CAST(n_docs + noise AS BIGINT) AS noisy_n
        |FROM n ORDER BY source""".stripMargin),

    // ------------------------------------------------------------------
    // l-diversity audit (Machanavajjhala et al. 2007 — the k-anonymity
    // companion): for each quasi-identifier group (nation, segment),
    // how many DISTINCT sensitive values (order priority) appear — a
    // group that is k-anonymous but sees a single priority still leaks.
    // Pre-aggregating to the (QI, custkey, sensitive) grain first keeps
    // the two distinct-counts off the raw join (the Expand-blow-up
    // lesson operates on a bounded-domain frame instead).
    "l_diversity_audit" -> QueryDef(
      (s, dir) => {
        val j = Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nation"),
            col("c_mktsegment").as("segment"),
            col("c_custkey"), col("o_orderpriority").as("sensitive"))
          .agg(count(lit(1)).as("cnt"))
        j.groupBy(col("nation"), col("segment"))
          .agg(
            sum(col("cnt")).as("n_rows"),
            countDistinct(col("c_custkey")).as("n_customers"),
            countDistinct(col("sensitive")).as("l_distinct"))
          .withColumn("l3_ok", col("l_distinct") >= 3)
          .orderBy(col("nation"), col("segment"))
      },
      """WITH j AS (
        |  SELECT c.c_nationkey AS nation, c.c_mktsegment AS segment,
        |         o.o_orderpriority AS sensitive, c.c_custkey
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
        |g AS (
        |  SELECT nation, segment,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
        |    CAST(count(DISTINCT sensitive) AS BIGINT) AS l_distinct
        |  FROM j GROUP BY 1, 2)
        |SELECT nation, segment, n_rows, n_customers, l_distinct, l_distinct >= 3 AS l3_ok
        |FROM g ORDER BY nation, segment""".stripMargin),

    // ------------------------------------------------------------------
    // Right-to-be-forgotten purge audit: for a deterministic erasure
    // cohort (custkey % 97 = 0 — the DSR batch), the cascade counts a
    // deletion job must produce (customers, their orders, those
    // orders' lineitems), the retained-row counts after the purge, and
    // the residual-reference count over the RETAINED orders — the
    // verification a DPO signs off on, which must be ZERO by
    // construction of the anti-join (stated in both engines, so a
    // broken cascade hash-mismatches). Semi/anti joins only — no
    // wide fact shuffle; at 100 TB each is a broadcast of the cohort.
    "rtbf_purge_audit" -> QueryDef(
      (s, dir) => {
        val victims = Tables.customer(s, dir)
          .filter(pmod(col("c_custkey"), lit(97)) === 0)
          .select(col("c_custkey"))
        val orders = Tables.orders(s, dir)
        val li = Tables.lineitem(s, dir)
        val purgedOrders = orders.join(
          victims, col("o_custkey") === col("c_custkey"), "left_semi")
        val purgedLi = li.join(
          purgedOrders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        val keptOrders = orders.join(
          victims, col("o_custkey") === col("c_custkey"), "left_anti")
        val residual = keptOrders.join(
          victims, col("o_custkey") === col("c_custkey"), "left_semi")
        victims.agg(count(lit(1)).as("n_customers"))
          .crossJoin(purgedOrders.agg(count(lit(1)).as("n_orders_purged")))
          .crossJoin(purgedLi.agg(count(lit(1)).as("n_lineitems_purged")))
          .crossJoin(keptOrders.agg(count(lit(1)).as("n_orders_kept")))
          .crossJoin(residual.agg(count(lit(1)).as("residual_refs")))
      },
      """WITH victims AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |po AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM victims)),
        |pl AS (SELECT 1 FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM po)),
        |ko AS (SELECT o_custkey FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM victims))
        |SELECT
        |  CAST((SELECT count(*) FROM victims) AS BIGINT) AS n_customers,
        |  CAST((SELECT count(*) FROM po) AS BIGINT) AS n_orders_purged,
        |  CAST((SELECT count(*) FROM pl) AS BIGINT) AS n_lineitems_purged,
        |  CAST((SELECT count(*) FROM ko) AS BIGINT) AS n_orders_kept,
        |  CAST((SELECT count(*) FROM ko
        |        WHERE o_custkey IN (SELECT c_custkey FROM victims)) AS BIGINT) AS residual_refs""".stripMargin),

    // ------------------------------------------------------------------
    // t-closeness audit (Li, Li & Venkatasubramanian 2007, ICDE —
    // public literature): for each equivalence class of the quasi-
    // identifiers (nation, market segment), the Earth Mover's Distance
    // between the class's distribution of the ORDERED sensitive
    // attribute (account-balance decile, a fixed 1100-wide binning of
    // the [-1000, 10000) domain) and the global distribution. For an
    // ordered attribute EMD is the mean absolute difference of the two
    // CDFs; cross-multiplying the cumulative counts keeps it integer —
    // emd_scaled = Σᵢ |cumₚ(i)·N − cum_q(i)·m| over the v−1 = 9
    // interior cut points — and emd = emd_scaled/(m·N·9) is the single
    // IEEE division. Classes with the largest skew (the re-identification
    // risk t-closeness bounds) surface first. Everything is one keyed
    // class aggregation over a 9-way bucket explode — no window, no
    // all-pairs.
    "t_closeness_audit" -> QueryDef(
      (s, dir) => {
        val c = Tables.customer(s, dir).select(
          col("c_nationkey").cast("long").as("nk"), col("c_mktsegment").as("seg"),
          // integer cents keep the binning exact (decimal literals parse
          // as DECIMAL in DuckDB but double in Spark — avoid both)
          least(lit(9L), greatest(lit(0L),
            expr("(CAST(c_acctbal * 100 AS BIGINT) + 100000) div 110000"))).as("b"))
          .localCheckpoint() // feeds class sizes, global + per-class CDFs
        val cls = c.groupBy(col("nk"), col("seg")).agg(count(lit(1)).as("m"))
        val nTot = c.agg(count(lit(1)).as("n"))
        val cuts = c.withColumn("i", explode(expr("sequence(0, 8)")))
        val cump = cuts.groupBy(col("nk"), col("seg"), col("i"))
          .agg(sum(when(col("b") <= col("i"), 1L).otherwise(0L)).as("cp"))
        val cumq = cuts.groupBy(col("i"))
          .agg(sum(when(col("b") <= col("i"), 1L).otherwise(0L)).as("cq"))
        cump
          .join(cumq, Seq("i"))
          .join(cls, Seq("nk", "seg"))
          .crossJoin(broadcast(nTot))
          .groupBy(col("nk").as("nationkey"), col("seg").as("mktsegment"),
            col("m").as("class_size"), col("n"))
          .agg(sum(abs(col("cp") * col("n") - col("cq") * col("m"))).as("emd_scaled"))
          .select(col("nationkey"), col("mktsegment"), col("class_size"),
            col("emd_scaled"),
            (col("emd_scaled").cast("double") /
              (col("class_size") * col("n") * 9).cast("double")).as("emd"))
          .orderBy(col("emd").desc, col("nationkey"), col("mktsegment"))
          .limit(20)
      },
      """WITH c AS (
        |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST(least(9, greatest(0, (CAST(c_acctbal * 100 AS BIGINT) + 100000) // 110000)) AS BIGINT) AS b
        |  FROM customer),
        |cls AS (SELECT nk, seg, CAST(count(*) AS BIGINT) AS m FROM c GROUP BY 1, 2),
        |n_tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |buckets AS (SELECT unnest(range(0, 9)) AS i),
        |cuts AS (SELECT c.nk, c.seg, c.b, b2.i FROM c CROSS JOIN buckets b2),
        |cump AS (
        |  SELECT nk, seg, i,
        |    CAST(sum(CASE WHEN b <= i THEN 1 ELSE 0 END) AS BIGINT) AS cp
        |  FROM cuts GROUP BY 1, 2, 3),
        |cumq AS (
        |  SELECT i, CAST(sum(CASE WHEN b <= i THEN 1 ELSE 0 END) AS BIGINT) AS cq
        |  FROM cuts GROUP BY 1)
        |SELECT CAST(p.nk AS BIGINT) AS nationkey, p.seg AS mktsegment,
        |  cls.m AS class_size,
        |  CAST(sum(abs(p.cp * n.n - q.cq * cls.m)) AS BIGINT) AS emd_scaled,
        |  CAST(CAST(sum(abs(p.cp * n.n - q.cq * cls.m)) AS BIGINT) AS DOUBLE)
        |    / CAST(cls.m * n.n * 9 AS DOUBLE) AS emd
        |FROM cump p JOIN cumq q ON q.i = p.i
        |JOIN cls ON cls.nk = p.nk AND cls.seg = p.seg
        |CROSS JOIN n_tot n
        |GROUP BY 1, 2, 3, cls.m, n.n
        |ORDER BY emd DESC, nationkey, mktsegment LIMIT 20""".stripMargin)
  )
}
