package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-conditioned graph operators over an undirected edge frame
  * (columns `u`, `v`, both directions present — the
  * [[PageRank]]/[[Dedup.connectedComponents]] convention).
  *
  * Both are bounded-round iterative equi-joins — the only shape that
  * survives 100 TB graphs: each round is one degree aggregation plus
  * one (or two) keyed semi-joins on the node id, no driver
  * participation, no all-pairs anything. The edge frame is
  * lineage-truncated once up front (localCheckpoint = the cluster's
  * parquet-write analog) because every round rescans it.
  */
object GraphOps {

  /** Truncated k-core peel (Seidman 1983, "Network structure and
    * minimum degree" — public literature): `rounds` iterations of
    * {count degrees → keep nodes with degree ≥ k → keep edges with
    * both endpoints kept}. Returns the surviving nodes with their
    * degree in the final restricted subgraph. Fixed-round truncation
    * (not to-convergence) is the contract — the oracle replays the
    * same rounds; on real graphs the peel cascades and `rounds`
    * bounds the sequential depth, exactly like the fixed-round
    * PageRank contract.
    */
  def kcoreTruncated(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    var e = edges.select(col("u"), col("v")).localCheckpoint()
    var r = 0
    while (r < rounds) {
      val surv = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
      // NO per-round checkpoint here: A/B'd at sf0.1 (r8) — AQE reuses
      // the materialized exchanges across surv's two join sides and
      // the next round's agg, and the checkpointed variant measured
      // equal-or-slower (2.9-4.2s plain vs 3.6-4.0s checkpointed), the
      // PrefixSum lesson again. bfsHops below is the opposite case
      // (its frontier lineage is NOT exchange-shaped, so it keeps one).
      e = e
        .join(surv.select(col("u").as("ku")), col("u") === col("ku")).drop("ku")
        .join(surv.select(col("u").as("kv")), col("v") === col("kv")).drop("kv")
      r += 1
    }
    e.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Bounded-round BFS hop levels from a seed frame (column `node`):
    * hop 0 = seeds, hop r = nodes first reached in round r ≤ `rounds`.
    * Frontier-only expansion — each round joins ONLY the newly
    * reached nodes to the edge frame and anti-joins the visited set,
    * so per-round work is proportional to the frontier, not the
    * visited set (the textbook distributed-BFS shape).
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    val e = edges.select(col("u"), col("v")).localCheckpoint()
    var visited = seeds.select(col("node")).distinct()
      .withColumn("hop", lit(0)).localCheckpoint()
    var frontier = visited.select(col("node").as("fnode"))
    var r = 1
    while (r <= rounds) {
      // checkpoint the frontier: it is consumed by BOTH the visited
      // union and the next round's expansion join — unchecked, round
      // r's frontier lineage re-runs every earlier round's join
      val next = e.join(frontier, col("u") === col("fnode"))
        .select(col("v").as("node")).distinct()
        .join(visited.select(col("node").as("vn")),
          col("node") === col("vn"), "left_anti")
        .withColumn("hop", lit(r))
        .localCheckpoint()
      visited = visited.unionByName(next).localCheckpoint()
      frontier = next.select(col("node").as("fnode"))
      r += 1
    }
    visited
  }
}
