package graft

import org.apache.spark.sql.functions._

import graft.operators.NegativeSampling

/** Hash-drawn negatives: pure function of (id, draw index) — invariant
  * to partition layout — never self, always a real corpus id, at most
  * k per row (exactly k minus deterministic self-draw collisions).
  */
class NegativeSamplingSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = (0L until 400L).map(i => i * 3 + 7).toDF("id")

  test("deterministic, layout-invariant, self-free, in-corpus") {
    val idSet = corpus.as[Long].collect().toSet
    val a = NegativeSampling.draw(corpus, "id", k = 4)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = NegativeSampling.draw(corpus.repartition(13), "id", k = 4)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a == b, "draws must not depend on input partitioning")
    assert(a.forall { case (id, _, neg) => neg != id }, "self-draw leaked")
    assert(a.forall { case (_, _, neg) => idSet.contains(neg) })
    val perId = a.groupBy(_._1).view.mapValues(_.size)
    assert(perId.values.forall(n => n >= 3 && n <= 4),
      "each row draws k minus (rare) self-collisions")
    assert(a.size >= 400 * 4 - 10 && a.size <= 400 * 4)
    // draws actually spread over the corpus, not a constant partner
    assert(a.map(_._3).distinct.size > 300)
  }

  test("hardNegatives: band exclusion, per-query cap, layout independence") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(col("vec_id") < 5)
    val hn = NegativeSampling.hardNegatives(
      emb, probes, "vec_id", "embedding", kScan = 20, skipTop = 5, perQuery = 4)
      .as[(Long, Long, Int, Int)].collect().sorted.toSeq
    assert(hn.nonEmpty)
    // never a top-skipTop neighbor, never beyond the scan, cap holds
    assert(hn.forall { case (_, _, rank, _) => rank > 5 && rank <= 20 })
    val perQ = hn.groupBy(_._1).view.mapValues(_.size)
    assert(perQ.values.forall(_ == 4))
    assert(hn.forall { case (q, n, _, _) => q != n })
    val hn2 = NegativeSampling.hardNegatives(
      emb.repartition(7), probes, "vec_id", "embedding", 20, 5, 4)
      .as[(Long, Long, Int, Int)].collect().sorted.toSeq
    assert(hn == hn2)
  }
}
