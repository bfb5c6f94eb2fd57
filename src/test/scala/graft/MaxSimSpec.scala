package graft

import org.apache.spark.sql.functions._

import graft.operators.MaxSim
import graft.functions.exprs

/** Late-interaction MaxSim retrieval: kernel exactness vs a plain
  * Scala reference fold, planted-copy recall, layout invariance, and
  * output-shape contracts.
  */
class MaxSimSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Plain-Scala MaxSim with the identical fold order as the kernel. */
  private def refMaxSim(q: Seq[Float], d: Seq[Float], slices: Int): Double = {
    val len = math.min(q.length, d.length) / slices
    var total = 0.0
    for (i <- 0 until slices) {
      var best = Double.NegativeInfinity
      for (j <- 0 until slices) {
        var acc = 0.0
        var t = 0
        while (t < len) {
          acc += q(i * len + t).toDouble * d(j * len + t).toDouble
          t += 1
        }
        if (acc > best) best = acc
      }
      total += best
    }
    total
  }

  test("MaxSimScore kernel equals the reference fold bit-exactly") {
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").filter($"vec_id" < 20)
    val vecs = e.as[(Long, Seq[Float])].collect().toMap
    val got = e.as("a").crossJoin(e.as("b"))
      .select($"a.vec_id".as("qa"), $"b.vec_id".as("qb"),
        exprs.maxSimScore($"a.embedding", $"b.embedding", 4).as("s"))
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (qa, qb, s) =>
      assert(s == refMaxSim(vecs(qa), vecs(qb), 4), s"pair ($qa,$qb)")
    }
  }

  test("degenerate inputs: arrays shorter than the slice count score 0.0") {
    val got = spark.range(1).select(
      exprs.maxSimScore(
        typedLit(Seq(1.0f, 2.0f)), typedLit(Seq(3.0f, 4.0f)), 4).as("s"))
      .as[Double].head()
    assert(got == 0.0)
  }

  test("MaxSim of a vector against itself dominates the diagonal pairing") {
    // score(v, v) = Σ_i max_j dot(v_i, v_j) ≥ Σ_i dot(v_i, v_i) when the
    // diagonal sum uses the SAME slice-wise fold (a whole-array vecDot
    // associates differently and can differ by an ulp — the comparison
    // must decompose identically).
    val e = Tables.embeddings(spark, dir).filter($"vec_id" < 20)
    val diagSum = (0 until 4).map { i =>
      exprs.vecDot(slice($"embedding", i * 16 + 1, 16), slice($"embedding", i * 16 + 1, 16))
    }.reduceLeft(_ + _)
    val diag = e.select(
      exprs.maxSimScore($"embedding", $"embedding", 4).as("self"),
      diagSum.as("diag"))
      .as[(Double, Double)].collect()
    diag.foreach { case (self, d) => assert(self >= d && d > 0) }
  }

  test("planted scaled copies found at rank 1") {
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val perturbed = e.select(
      ($"vec_id" + 1000).as("vec_id"),
      transform($"embedding", x => x * lit(0.9f)).as("embedding"))
    val corpus = e.unionAll(perturbed)
    val probes = e.filter($"vec_id" < 50)
    val top1 = MaxSim.lateInteractionTopK(corpus, probes, "vec_id", "embedding",
      slices = 4, k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val hit = (0L until 50L).count(i => top1.contains((i, i + 1000)))
    assert(hit >= 45, s"top-1 planted-copy recall $hit/50")
  }

  test("IVF-routed MaxSim: neighbors come only from routed lists; layout-invariant") {
    import graft.functions.exprs.centroidIds
    val cs = graft.operators.IvfIndex.seededCentroids(dim = 64, nlist = 16, seed = 11L)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val probes = e.filter($"vec_id" < 10)
    def run(c: org.apache.spark.sql.DataFrame) =
      MaxSim.ivfLateInteractionTopK(c, probes, "vec_id", "embedding",
        slices = 4, k = 5, cs = cs, nprobe = 4)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val got = run(e)
    assert(got.nonEmpty)
    assert(got.sameElements(run(e.repartition(5, $"vec_id"))))
    // routing property: each neighbor's (single) list must be one of
    // the query's nprobe routed lists
    val corpusList = e.select($"vec_id",
      element_at(centroidIds($"embedding", cs, 1), 1).as("l"))
      .as[(Long, Long)].collect().toMap
    val probeLists = probes.select($"vec_id",
      centroidIds($"embedding", cs, 4).as("ls"))
      .as[(Long, Seq[Long])].collect().toMap
    got.foreach { case (q, n, _) =>
      assert(probeLists(q).contains(corpusList(n)), s"($q,$n) not in routed lists")
    }
  }

  test("result is layout-invariant and self-excluding with dense ranks") {
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val probes = e.filter($"vec_id" < 10)
    def run(c: org.apache.spark.sql.DataFrame) =
      MaxSim.lateInteractionTopK(c, probes, "vec_id", "embedding", 4, 5)
        .select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val a = run(e)
    val b = run(e.repartition(7, $"vec_id"))
    assert(a.sameElements(b))
    assert(a.forall { case (q, n, _) => q != n })
    a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).toSeq == (1 to 5))
    }
  }
}
