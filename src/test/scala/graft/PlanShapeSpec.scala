package graft

/** Plan-shape regression tripwires for the 20 most expensive queries
  * (r13 verdict item 3): snapshot each query's exchange count and join
  * strategy mix so a future edit that silently adds a shuffle or flips
  * a broadcast join to sort-merge FAILS here instead of surfacing as
  * an unexplained bench regression.
  *
  * The snapshot counts, per query (over the AQE initial physical plan,
  * deterministic at fixed config + fixture stats):
  *   shuffle exchanges, broadcast exchanges,
  *   BroadcastHashJoin, SortMergeJoin, ShuffledHashJoin,
  *   BroadcastNestedLoopJoin.
  * For the iterative queries (kcore, pagerank, BFS…) the rounds run at
  * CONSTRUCTION time over checkpointed frames, so the snapshot covers
  * the final assembly plan — the per-round shapes are asserted by the
  * operators' own specs; this tripwire catches edits to the visible
  * plan tail.
  *
  * On drift: the failure message prints the full actual map in the
  * exact literal format below — if the change is INTENTIONAL (a new
  * stage, a deliberate strategy change), paste it in with a note in
  * the commit; if not, you just caught a regression.
  */
class PlanShapeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private case class Shape(shuffles: Int, bcasts: Int, bhj: Int,
      smj: Int, shj: Int, bnlj: Int) {
    override def toString =
      s"Shape($shuffles, $bcasts, $bhj, $smj, $shj, $bnlj)"
  }

  private def shapeOf(plan: String): Shape = {
    def n(re: scala.util.matching.Regex) = re.findAllIn(plan).length
    Shape(
      n("(?<!Broadcast)Exchange (?:hash|range|Single)".r),
      n("BroadcastExchange".r),
      n("BroadcastHashJoin".r),
      n("SortMergeJoin".r),
      n("ShuffledHashJoin".r),
      n("BroadcastNestedLoopJoin".r))
  }

  // bench_latest.json top-20 by sweep seconds (r13 final sweep).
  private val expected = Map(
    "bfs_hops_from_seeds" -> Shape(2, 0, 0, 0, 0, 0),
    // r14 change (f): cf_item_neighbors reads the shared basketPairsAll
    // artifact (one self-join for three consumers) — 12 shuffles/4 bcasts
    // dropped to 6/2; r15: the shared (order, part) items artifact
    // removed the per-query distinct too — 6 shuffles down to 4.
    "cf_item_neighbors" -> Shape(4, 2, 2, 0, 0, 0),
    "closeness_centrality_seeds" -> Shape(2, 0, 0, 0, 0, 0),
    "dbscan_embedding_clusters" -> Shape(6, 0, 0, 2, 0, 0),
    "dbscan_ivf_clusters" -> Shape(6, 0, 0, 2, 0, 0),
    "dedup_index_compact" -> Shape(2, 3, 3, 0, 0, 0),
    "dedup_lsh_eval" -> Shape(8, 8, 8, 1, 0, 0),
    "deepwalk_pairs" -> Shape(25, 0, 0, 12, 0, 0),
    "greedy_matching_trade" -> Shape(2, 0, 0, 0, 0, 0),
    "hits_hubs_authorities" -> Shape(91, 66, 44, 0, 0, 22),
    "kcore_decomposition" -> Shape(55, 0, 0, 26, 0, 0),
    "knn_graph_retrain_drift" -> Shape(9, 5, 1, 3, 0, 4),
    "luby_mis_trade" -> Shape(2, 0, 0, 0, 0, 0),
    "mef_star_append_fold" -> Shape(3, 2, 2, 0, 0, 0),
    "mef_star_dpp_prune" -> Shape(2, 1, 1, 0, 0, 0),
    "mef_star_incremental_ytd" -> Shape(3, 2, 2, 0, 0, 0),
    "pagerank_supplier_customer" -> Shape(5, 5, 5, 0, 0, 0),
    "ppr_supplier_seeds" -> Shape(5, 10, 10, 0, 0, 0),
    "rtbf_lsh_purge" -> Shape(2, 3, 3, 0, 0, 0),
    "semdedup_knn_clusters" -> Shape(4, 0, 0, 1, 0, 0))

  test("top-20 query plan shapes match the committed snapshot") {
    val actual = expected.keys.toSeq.sorted.map { name =>
      val fn = SparkEntry.queries(name)
      name -> shapeOf(fn(spark, dir).queryExecution.executedPlan.toString)
    }
    val drifted = actual.filter { case (n, s) => expected(n) != s }
    val dump = actual
      .map { case (n, s) => s"""    "$n" -> $s,""" }.mkString("\n")
    assert(drifted.isEmpty,
      s"plan shapes drifted for ${drifted.map(_._1).mkString(", ")} — " +
        s"if intentional, update the snapshot to:\n$dump")
  }
}
