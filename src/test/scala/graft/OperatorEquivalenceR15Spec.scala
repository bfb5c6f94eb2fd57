package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, PageRank}

/** r15 optimization-round tripwires: the operator-internal fast paths
  * added this round must be RESULT-IDENTICAL to the general paths.
  *
  * - lubyMis/greedyMatching `assumeCanonical = true` skips the
  *   defensive re-distinct — valid only because the caller warrants a
  *   distinct, u ≠ v input; on such input both paths must agree
  *   exactly (same winners, same rounds).
  * - PageRank.prepare + runPrepared / runPersonalizedPrepared must
  *   reproduce run / runPersonalized bit-for-bit (the prepared pair
  *   is the same (deg, ed) derivation, checkpointed).
  */
class OperatorEquivalenceR15Spec extends SparkSuite {

  // Deterministic bipartite-ish multigraph, then canonicalized the way
  // the trade-graph artifact is: distinct, u ≠ v, both directions.
  private lazy val canonicalEdges = {
    val base = spark.range(0, 120).select(
      (col("id") % 17 * 2).as("u"), (col("id") % 23 * 2 + 1).as("v"))
    base.unionByName(base.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("lubyMis assumeCanonical path matches the general path") {
    val general = GraphOps.lubyMis(canonicalEdges, maxRounds = 8)
    val fast = GraphOps.lubyMis(canonicalEdges, maxRounds = 8,
      assumeCanonical = true)
    assert(rows(fast) == rows(general))
  }

  test("greedyMatching assumeCanonical path matches the general path") {
    // one-directional unique pairs (the greedy_matching_trade input)
    val pairs = canonicalEdges.filter(col("u") < col("v")).localCheckpoint()
    val general = GraphOps.greedyMatching(pairs, maxRounds = 8)
    val fast = GraphOps.greedyMatching(pairs, maxRounds = 8,
      assumeCanonical = true)
    assert(rows(fast) == rows(general))
  }

  test("PageRank.runPrepared over prepare() matches run()") {
    val (deg, ed) = PageRank.prepare(canonicalEdges)
    val prepared = PageRank.runPrepared(deg, ed, rounds = 4)
    val direct = PageRank.run(canonicalEdges, rounds = 4)
    assert(rows(prepared) == rows(direct))
  }

  test("PageRank.runPersonalizedPrepared over prepare() matches runPersonalized()") {
    val seeds = spark.range(1, 4).select((col("id") * 2).as("node"))
    val (deg, ed) = PageRank.prepare(canonicalEdges)
    val prepared = PageRank.runPersonalizedPrepared(deg, ed, seeds, rounds = 4)
    val direct = PageRank.runPersonalized(canonicalEdges, seeds, rounds = 4)
    assert(rows(prepared) == rows(direct))
  }
}
