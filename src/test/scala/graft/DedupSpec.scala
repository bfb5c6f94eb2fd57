package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, MinHashLsh, SimHashDedup, Similarity, TextOps}
import graft.functions.exprs

/** Approximate dedup/similarity operators verified against planted
  * ground truth: originals ∪ perturbed copies (id+1000). A correct
  * implementation must recover (i, i+1000) pairs with high recall and
  * report no wildly-wrong extras.
  */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** originals ∪ light perturbation (drop first token) at id+1000. */
  private lazy val corpus: DataFrame = {
    val d = Tables.documents(spark, dir).select($"doc_id", $"text").filter($"doc_id" < 100)
    d.unionAll(d.select(
      ($"doc_id" + 1000).as("doc_id"),
      regexp_replace($"text", "^\\S+\\s*", "").as("text")))
  }

  private lazy val plantedPairs: Set[(Long, Long)] =
    (0L until 100L).map(i => (i, i + 1000L)).toSet

  private lazy val exactPairs: Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

  test("exactGroups: doubled corpus → every group has n_dups == 2") {
    val g = Dedup.exactGroups(corpus.unionAll(corpus), "doc_id", "text").collect()
    assert(g.forall(_.getAs[Long]("n_dups") == 2L))
    assert(g.length == 200)
  }

  test("ngramJaccardPairs: recovers all planted near-dup pairs") {
    assert(plantedPairs.subsetOf(exactPairs),
      s"missing ${(plantedPairs -- exactPairs).take(5)}")
  }

  test("connectedComponents: chains close transitively, labels = min member id") {
    // components: {1,2,3,4} via chain (needs >1 propagation round), {10,11}
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // a 60-hop path exceeds the round budget of plain diameter-bound
    // propagation (maxIter = 25) — converging here proves the
    // pointer-jumping shortcut delivers O(log diameter) rounds
    val chain = (1L until 61L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ccChain = graft.operators.Dedup.connectedComponents(chain, "id_a", "id_b")
      .collect().map(r => r.getLong(1)).toSet
    assert(ccChain == Set(1L), "61-vertex path collapses to one component")
  }

  test("keepRepresentatives: one survivor per cluster, singletons pass through") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = graft.operators.Dedup.keepRepresentatives(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L), "min id survives per cluster; 4 is a singleton")
  }

  test("minhash LSH: recall ≥ 0.9 vs exact jaccard≥0.5 pairs, est within 0.2") {
    val got = MinHashLsh.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val recall = (got & exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("simhash: hamming ≤ 3 pairs include most planted dups") {
    val got = SimHashDedup.nearDupPairs(corpus, "doc_id", "text", maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val recall = (got & plantedPairs).size.toDouble / plantedPairs.size
    assert(recall >= 0.7, s"recall $recall (simhash is coarser than minhash)")
    // sanity: identical docs → identical fingerprints → all found
    val self = SimHashDedup.nearDupPairs(
      corpus.unionAll(corpus.withColumn("doc_id", $"doc_id" + 5000)),
      "doc_id", "text", maxHamming = 0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert((0L until 100L).forall(i => self.contains((i, i + 5000))))
  }

  test("winnow fingerprints: shared substrings → shared fingerprints") {
    val fp = corpus.select($"doc_id", exprs.winnowFingerprint($"text", 8, 4).as("fp"))
    val a = fp.filter($"doc_id" === 0).select(explode($"fp")).as[Long].collect().toSet
    val b = fp.filter($"doc_id" === 1000).select(explode($"fp")).as[Long].collect().toSet
    val overlap = (a & b).size.toDouble / math.min(a.size, b.size)
    assert(overlap >= 0.8, s"suffix-sharing docs overlap $overlap")
    val unrel = fp.filter($"doc_id" === 1).select(explode($"fp")).as[Long].collect().toSet
    assert((a & unrel).size.toDouble / math.min(a.size, unrel.size) < overlap)
  }

  test("LSH ANN: near-duplicate-grade neighbors recovered at rank 1") {
    // LSH's contract is high recall for HIGH-cosine neighbors; random
    // corpora whose top-5 sit at cosine ~0.4 need bruteForceTopK. Plant
    // true near neighbors (slightly perturbed copies at id+1000) and
    // require the copy to be found as the top match.
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val perturbed = e.select(
      ($"vec_id" + 1000).as("vec_id"),
      transform($"embedding", x => x * lit(0.9f) + lit(0.02f)).as("embedding"))
    val corpus = e.unionAll(perturbed)
    val probes = e.filter($"vec_id" < 50)
    val approx = Similarity.lshTopK(corpus, probes, "vec_id", "embedding", 1, dim = 64)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val hit = (0L until 50L).count(i => approx.contains((i, i + 1000)))
    assert(hit >= 45, s"top-1 planted-copy recall $hit/50")
  }

  test("multi-probe LSH: flips recover the recall extra tables would buy") {
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val perturbed = e.select(
      ($"vec_id" + 1000).as("vec_id"),
      transform($"embedding", x => x * lit(0.9f) + lit(0.02f)).as("embedding"))
    val corpus = e.unionAll(perturbed)
    val probes = e.filter($"vec_id" < 50)
    def recallOf(res: org.apache.spark.sql.DataFrame): Int = {
      val s = res.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      (0L until 50L).count(i => s.contains((i, i + 1000)))
    }
    // same 6 tables: single-probe vs 4-flip multi-probe
    val single = recallOf(Similarity.lshTopK(
      corpus, probes, "vec_id", "embedding", 1, dim = 64, tables = 6))
    val multi = recallOf(Similarity.multiProbeLshTopK(
      corpus, probes, "vec_id", "embedding", 1, dim = 64,
      tables = 6, planesPerTable = 8, flips = 4))
    assert(multi >= single, s"multi-probe $multi < single-probe $single")
    assert(multi >= 45, s"multi-probe top-1 planted-copy recall $multi/50")
  }

  test("IVF ANN: planted near-copies found; recall vs brute force reasonable") {
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val perturbed = e.select(
      ($"vec_id" + 1000).as("vec_id"),
      transform($"embedding", x => x * lit(0.9f) + lit(0.02f)).as("embedding"))
    val corpus = e.unionAll(perturbed)
    val probes = e.filter($"vec_id" < 50)
    val got = operators.IvfIndex.topK(corpus, probes, "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val hit = (0L until 50L).count(i => got.contains((i, i + 1000)))
    assert(hit >= 40, s"IVF top-1 planted-copy recall $hit/50")
  }

  test("IVF training is layout-invariant and exactly reproducible") {
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    def train(df: DataFrame) = operators.IvfIndex.trainCentroids(
      df, "vec_id", "embedding", nlist = 16, sampleSize = 10000, iters = 5, seed = 42L)
    val a = train(e)
    val b = train(e.repartition(13))
    val c = train(e.orderBy($"vec_id".desc))
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq == c.map(_.toSeq).toSeq)
    // centroids are exactly-representable doubles on the 2^-20 grid
    assert(a.flatten.forall(x => (x + 4.0) * 1048576.0 == math.rint((x + 4.0) * 1048576.0)))
  }

  test("embedding nearDupPairs: scaled copies pair with originals") {
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding").filter($"vec_id" < 100)
    val c = e.unionAll(e.select(
      ($"vec_id" + 1000).as("vec_id"),
      transform($"embedding", x => x * lit(1.5f)).as("embedding")))
    val got = Similarity.nearDupPairs(c, "vec_id", "embedding", dim = 64, threshold = 0.99)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val planted = (0L until 100L).map(i => (i, i + 1000L)).toSet
    val recall = (got & planted).size.toDouble / planted.size
    assert(recall >= 0.95, s"recall $recall")
    assert(got.forall { case (a, b) => planted.contains((a, b)) || b - a != 1000 || a >= 1000 })
  }

  test("langId picks profile languages deterministically") {
    val df = Seq(
      "the cat and the dog of the house",
      "el perro y la casa de los gatos en la calle",
      "der hund und die katze von dem haus",
      "xyzzy plugh").toDF("text")
      .select(TextOps.langId($"text").as("l")).as[String].collect().toSeq
    assert(df == Seq("en", "es", "de", "und"))
  }
}
