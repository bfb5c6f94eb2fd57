package graft

import graft.operators.Mst

/** Borůvka MSF vs a host-side Kruskal under the same (w, u, v) total
  * order: exact edge-set equality on a multi-round path graph, a dense
  * random-weight graph (deterministic LCG), a weight-tied graph, and a
  * disconnected forest.
  */
class MstSpec extends SparkSuite {
  import spark.implicits._

  /** Host Kruskal with the (w, u, v) comparator — the uniqueness
    * argument makes its result THE msf for any total order.
    */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set[(Long, Long, Long)]()
    edges.sortBy { case (u, v, w) => (w, u, v) }.foreach { case (u, v, w) =>
      if (find(u) != find(v)) { parent(find(u)) = find(v); out += ((u, v, w)) }
    }
    out.toSet
  }

  private def run(edges: Seq[(Long, Long, Long)], maxRounds: Int = 16) =
    Mst.boruvka(edges.toDF("u", "v", "w"), maxRounds)
      .select("u", "v", "w").as[(Long, Long, Long)].collect().toSet

  test("tournament-ruler path forces multiple rounds and matches Kruskal") {
    // ruler weights: edge i gets 1000^(trailing ones of i) + i, so
    // round r can only merge blocks of size 2^r — a genuine
    // multi-round Borůvka run, not a single-round chain collapse
    def trailingOnes(i: Long): Int = java.lang.Long.numberOfTrailingZeros(~i)
    val path = (0L until 16L).map { i =>
      (i, i + 1, math.pow(1000.0, trailingOnes(i).toDouble).toLong + i)
    }
    val forest = Mst.boruvka(path.toDF("u", "v", "w"))
    assert(forest.select("u", "v", "w").as[(Long, Long, Long)].collect().toSet
      == kruskal(path))
    assert(forest.agg(org.apache.spark.sql.functions.max("round"))
      .collect()(0).getInt(0) >= 3, "expected a multi-round run")
  }

  test("dense LCG-weighted graph matches Kruskal") {
    var seed = 42L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); math.abs(seed % 1000) }
    val dense = for (u <- 0L until 12L; v <- (u + 1) until 12L) yield (u, v, next())
    assert(run(dense) == kruskal(dense))
  }

  test("weight ties resolve identically via the (w, u, v) order") {
    val tied = Seq((0L, 1L, 5L), (1L, 2L, 5L), (0L, 2L, 5L), (2L, 3L, 5L), (0L, 3L, 5L))
    assert(run(tied) == kruskal(tied))
  }

  test("disconnected graph yields a spanning FOREST (one tree per component)") {
    val forest = Seq((0L, 1L, 3L), (1L, 2L, 2L), (0L, 2L, 9L),
      (10L, 11L, 1L), (11L, 12L, 4L), (10L, 12L, 2L))
    val got = run(forest)
    assert(got == kruskal(forest))
    assert(got.size == 4) // 3 nodes -> 2 edges, twice
  }

  test("non-convergence within the round budget throws") {
    def trailingOnes(i: Long): Int = java.lang.Long.numberOfTrailingZeros(~i)
    val path = (0L until 16L).map { i =>
      (i, i + 1, math.pow(1000.0, trailingOnes(i).toDouble).toLong + i)
    }
    intercept[IllegalArgumentException] { run(path, maxRounds = 1) }
  }
}
