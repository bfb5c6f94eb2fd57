package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.exprs
import graft.operators.{GraphOps, Perceptron}

/** Degree-conditioned graph analytics (truncated k-core peel, bounded
  * BFS) over the supplier↔customer graph, and a distributed
  * integer-exact batch perceptron trained on the quantized embedding
  * table — the "linear probe" primitive of representation analysis.
  * All iterative: fixed rounds, one-or-two keyed joins per round,
  * bounded driver participation, and every round replayed bit-exactly
  * by the DuckDB oracle as unrolled CTEs (the PageRank/BPE recipe).
  */
object GraphLearnQueries {

  /** Shared supplier↔customer edge list (who supplies whom via
    * lineitem⋈orders) — the pagerank_supplier_customer graph: node id
    * = 2·suppkey for suppliers, 2·custkey+1 for customers, both
    * directions present.
    */
  private val edgesSql =
    """e0 AS MATERIALIZED (
      |  SELECT DISTINCT l.l_suppkey * 2 AS u, o.o_custkey * 2 + 1 AS v
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |e AS MATERIALIZED (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0)""".stripMargin

  private def edgesFrame(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val e0 = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(
        (col("l_suppkey") * 2).as("u"),
        (col("o_custkey") * 2 + 1).as("v"))
      .distinct()
    e0.unionByName(e0.select(col("v").as("u"), col("u").as("v"))).distinct()
  }

  /** Quantized-embedding feature frame (id, dim, x, y) with the
    * alternating-sign linear TEACHER label y = sign(Σ (−1)^d·x_d) —
    * a separable concept derived from the data itself, so the
    * perceptron provably converges (Novikoff 1962) and the round-error
    * curve the oracle replays actually falls. Integer features via the
    * QuantizeVec grid make every margin/update exact.
    */
  private def perceptronFeatures(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val feats = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"),
        posexplode(exprs.quantizeVec(col("embedding"), 1000)))
      .toDF("id", "dim", "x")
    val labels = feats.groupBy(col("id"))
      .agg(sum(when(col("dim") % 2 === 0, col("x")).otherwise(-col("x")))
        .as("m0"))
      .select(col("id").as("lid"),
        when(col("m0") > 0, 1L).otherwise(-1L).as("y"))
    feats.join(labels, col("id") === col("lid")).drop("lid")
      .localCheckpoint()
  }

  private val perceptronFeaturesSql =
    """q AS (SELECT vec_id AS id,
      |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings),
      |f AS (SELECT id, CAST(t.i - 1 AS INT) AS dim, q[t.i] AS x
      |      FROM q, LATERAL (SELECT unnest(range(1, len(q) + 1)) AS i) t),
      |y0 AS (SELECT id, CAST(SUM(CASE WHEN dim % 2 = 0 THEN x ELSE -x END) AS BIGINT) AS m0
      |       FROM f GROUP BY 1),
      |l AS (SELECT id, CASE WHEN m0 > 0 THEN 1 ELSE -1 END AS y FROM y0),
      |fl AS MATERIALIZED (SELECT f.id, f.dim, f.x, l.y FROM f JOIN l ON f.id = l.id),
      |w0 AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS dim, CAST(0 AS BIGINT) AS w)""".stripMargin

  /** Unrolled perceptron rounds 1..k: m{r} margins, mis{r}
    * misclassified ids, u{r} per-dim updates, w{r} next weights.
    */
  private def perceptronRoundsSql(k: Int): String =
    (1 to k).map { r =>
      s""",
         |m$r AS MATERIALIZED (
         |  SELECT fl.id, fl.y, CAST(SUM(w.w * fl.x) AS BIGINT) AS margin
         |  FROM fl JOIN w${r - 1} w ON w.dim = fl.dim GROUP BY 1, 2),
         |mis$r AS MATERIALIZED (SELECT id, y FROM m$r WHERE y * margin <= 0),
         |u$r AS (SELECT fl.dim, CAST(SUM(fl.y * fl.x) AS BIGINT) AS du
         |        FROM fl JOIN mis$r ON fl.id = mis$r.id GROUP BY 1),
         |w$r AS MATERIALIZED (
         |  SELECT w.dim, CAST(w.w + coalesce(u.du, 0) AS BIGINT) AS w
         |  FROM w${r - 1} w LEFT JOIN u$r u ON w.dim = u.dim)""".stripMargin
    }.mkString

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // Truncated k-core peel (k=10, 3 rounds) of the supplier↔customer
    // graph: iteratively strip nodes with fewer than 10 distinct
    // trading partners, reporting the surviving core's size and degree
    // envelope per node kind. The dense-core extraction step of graph
    // cleanup (spam/bot pruning keeps the k-core; the periphery is
    // the suspect part). Each round: one degree agg + two semi-joins
    // on the node id — scales with |E| like the PageRank rounds.
    "kcore_decomposition" -> QueryDef(
      (s, dir) =>
        GraphOps.kcoreTruncated(edgesFrame(s, dir), k = 10, rounds = 3)
          .select(
            when(col("node") % 2 === 0, "supplier").otherwise("customer")
              .as("kind"),
            col("deg"))
          .groupBy(col("kind"))
          .agg(
            count(lit(1)).as("n_nodes"),
            min(col("deg")).as("min_deg"),
            max(col("deg")).as("max_deg"),
            sum(col("deg")).as("n_halfedges"))
          .orderBy(col("kind")), {
        val rounds = (0 until 3).map { i =>
          s""",
             |d$i AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM pe$i GROUP BY 1),
             |s$i AS (SELECT u FROM d$i WHERE deg >= 10),
             |pe${i + 1} AS MATERIALIZED (
             |  SELECT x.u, x.v FROM pe$i x
             |  JOIN s$i a ON x.u = a.u JOIN s$i b ON x.v = b.u)""".stripMargin
        }.mkString
        s"""WITH $edgesSql,
           |pe0 AS (SELECT u, v FROM e)$rounds,
           |df AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM pe3 GROUP BY 1)
           |SELECT CASE WHEN u % 2 = 0 THEN 'supplier' ELSE 'customer' END AS kind,
           |  CAST(count(*) AS BIGINT) AS n_nodes,
           |  CAST(min(deg) AS BIGINT) AS min_deg,
           |  CAST(max(deg) AS BIGINT) AS max_deg,
           |  CAST(sum(deg) AS BIGINT) AS n_halfedges
           |FROM df GROUP BY 1 ORDER BY kind""".stripMargin
      }),

    // ------------------------------------------------------------------
    // Bounded BFS (3 rounds) from suppliers {1,2,3}: hop-level census
    // of the reachable neighborhood by node kind — the blast-radius /
    // influence-sphere primitive (abuse propagation, recall expansion
    // in graph retrieval). Frontier-only expansion: each round joins
    // only the newly reached nodes to the edge list and anti-joins the
    // visited set, so per-round cost tracks the frontier.
    "bfs_hops_from_seeds" -> QueryDef(
      (s, dir) => {
        val seeds = s.range(1, 4).select((col("id") * 2).as("node"))
        GraphOps.bfsHops(edgesFrame(s, dir), seeds, rounds = 3)
          .select(
            col("hop"),
            when(col("node") % 2 === 0, "supplier").otherwise("customer")
              .as("kind"))
          .groupBy(col("hop"), col("kind"))
          .agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("hop"), col("kind"))
      }, {
        val rounds = (1 to 3).map { r =>
          s""",
             |n$r AS MATERIALIZED (
             |  SELECT DISTINCT e.v AS node FROM e JOIN f${r - 1} f ON e.u = f.node
             |  WHERE e.v NOT IN (SELECT node FROM h${r - 1})),
             |h$r AS MATERIALIZED (
             |  SELECT node, hop FROM h${r - 1}
             |  UNION ALL SELECT node, $r AS hop FROM n$r),
             |f$r AS (SELECT node FROM n$r)""".stripMargin
        }.mkString
        s"""WITH $edgesSql,
           |h0 AS (SELECT unnest([2, 4, 6]) AS node, 0 AS hop),
           |f0 AS (SELECT node FROM h0)$rounds
           |SELECT CAST(hop AS INT) AS hop,
           |  CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END AS kind,
           |  CAST(count(*) AS BIGINT) AS n_nodes
           |FROM h3 GROUP BY 1, 2 ORDER BY hop, kind""".stripMargin
      }),

    // ------------------------------------------------------------------
    // Distributed batch-perceptron training (5 rounds) on the
    // quantized embedding table against the alternating-sign teacher:
    // the output is the full weight TRAJECTORY (w after every round),
    // which the oracle reproduces by unrolling all five
    // margin→misclassify→update rounds in SQL. Model-in-the-plan,
    // data-in-the-cluster: per round two scans of the checkpointed
    // feature frame, 64 update rows to the driver.
    "perceptron_train_weights" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val (hist, _) = Perceptron.train(
          perceptronFeatures(s, dir), dims = 64, rounds = 5)
        (0 until 64)
          .map(d => (d, hist(0)(d), hist(1)(d), hist(2)(d), hist(3)(d),
            hist(4)(d)))
          .toDF("dim", "w_r1", "w_r2", "w_r3", "w_r4", "w_r5")
          .orderBy(col("dim"))
      },
      s"""WITH $perceptronFeaturesSql${perceptronRoundsSql(5)}
         |SELECT w1.dim, w1.w AS w_r1, w2.w AS w_r2, w3.w AS w_r3,
         |       w4.w AS w_r4, w5.w AS w_r5
         |FROM w1 JOIN w2 ON w1.dim = w2.dim JOIN w3 ON w1.dim = w3.dim
         |  JOIN w4 ON w1.dim = w4.dim JOIN w5 ON w1.dim = w5.dim
         |ORDER BY w1.dim""".stripMargin),

    // ------------------------------------------------------------------
    // The perceptron's LEARNING CURVE: misclassification counts (split
    // by class) of the entering weights at every round — round 1 is
    // the zero model (everything misclassified), and the count falls
    // as the teacher concept is learned; the oracle replays the same
    // five rounds and must reproduce the identical curve. This is the
    // convergence evidence for the trainer above.
    "perceptron_round_errors" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val (_, stats) = Perceptron.train(
          perceptronFeatures(s, dir), dims = 64, rounds = 5)
        stats.map(st => (st.round, st.nMisPos, st.nMisNeg))
          .toDF("round", "n_mis_pos", "n_mis_neg")
          .withColumn("n_mis", col("n_mis_pos") + col("n_mis_neg"))
          .orderBy(col("round"))
      }, {
        val rows = (1 to 5).map { r =>
          s"""SELECT $r AS round,
             |  CAST(count(*) FILTER (WHERE y = 1) AS BIGINT) AS n_mis_pos,
             |  CAST(count(*) FILTER (WHERE y = -1) AS BIGINT) AS n_mis_neg
             |FROM mis$r""".stripMargin
        }.mkString(" UNION ALL ")
        s"""WITH $perceptronFeaturesSql${perceptronRoundsSql(5)}
           |SELECT CAST(round AS INT) AS round, n_mis_pos, n_mis_neg,
           |  CAST(n_mis_pos + n_mis_neg AS BIGINT) AS n_mis
           |FROM ($rows) ORDER BY round""".stripMargin
      })
  )
}
