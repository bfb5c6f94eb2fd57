package graft

import org.apache.spark.sql.functions._

import graft.operators.{KnnGraph, Similarity}

/** Unit evidence for the corpus-wide kNN-graph builder: full-probe
  * routing reproduces brute force exactly (candidate generation loses
  * nothing when every list is visited), restricted probing still finds
  * in-cluster neighbors on a clustered fixture, and mutual
  * sparsification keeps exactly the reciprocated edges.
  */
class KnnGraphSpec extends SparkSuite {
  import spark.implicits._

  // two well-separated clusters on the first two axes
  private def clustered = Seq(
    (1L, Array(1.0f, 0.1f)), (2L, Array(0.9f, 0.2f)), (3L, Array(1.1f, 0.0f)),
    (11L, Array(0.1f, 1.0f)), (12L, Array(0.0f, 0.9f)), (13L, Array(0.2f, 1.1f)))
    .toDF("vec_id", "embedding")

  private val centers = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))

  test("full-probe kNN graph equals brute force") {
    val g = KnnGraph.buildWithCentroids(
      clustered, "vec_id", "embedding", k = 2, cs = centers, nprobe = 2)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val bf = Similarity.bruteForceTopK(
      clustered, clustered, "vec_id", "embedding", k = 2)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(g == bf, "nprobe = nlist loses no candidate")
  }

  test("single-probe routing keeps in-cluster neighbors on clustered data") {
    val g = KnnGraph.buildWithCentroids(
      clustered, "vec_id", "embedding", k = 2, cs = centers, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every node's 2 nearest are its cluster mates — all found with
    // nprobe=1 because the cluster IS the list
    val expect = Set(
      (1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 2L),
      (11L, 12L), (11L, 13L), (12L, 11L), (12L, 13L), (13L, 11L), (13L, 12L))
    assert(g == expect)
  }

  test("buildIvfPq with full probing and exhaustive shortlist equals brute force") {
    // shortK ≥ corpus: the ADC stage cannot lose a candidate, so the
    // exact rerank must reproduce the brute-force graph
    val g = KnnGraph.buildIvfPq(
      clustered, "vec_id", "embedding", k = 2, shortK = 6,
      coarse = centers,
      codebooks = graft.operators.PqIndex.seededCodebooks(
        dim = 2, m = 2, ksub = 4, seed = 7L),
      nprobe = 2)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val bf = Similarity.bruteForceTopK(
      clustered, clustered, "vec_id", "embedding", k = 2)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(g == bf)
  }

  test("appendWithCentroids equals a full rebuild (fixed quantizer)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val fresh = emb.filter(col("vec_id") % 10 === 0)
    val cs = graft.operators.IvfIndex.trainCentroids(
      base, "vec_id", "embedding", nlist = 16,
      sampleSize = 10000, iters = 5, seed = 42L)
      .map(_.toIndexedSeq).toIndexedSeq
    val baseKnn = KnnGraph.buildWithCentroids(
      base, "vec_id", "embedding", k = 5, cs, nprobe = 8)
    val inc = KnnGraph.appendWithCentroids(
      baseKnn, base, fresh, "vec_id", "embedding", k = 5, cs, nprobe = 8)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val full = KnnGraph.buildWithCentroids(
      emb, "vec_id", "embedding", k = 5, cs, nprobe = 8)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(inc == full,
      "top-k(top-k(base) ∪ fresh candidates) ≡ top-k over the full corpus")
  }

  test("bruteForceTopKBlocked equals the broadcast brute force") {
    // the blocked (matrix-multiply-shaped) all-pairs must reproduce the
    // broadcast path's ranking AND similarity bit-for-bit — same kernel,
    // same tie-break, only the distribution strategy differs; block
    // counts deliberately don't divide the corpus evenly
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val blocked = Similarity.bruteForceTopKBlocked(
      emb, emb, "vec_id", "embedding", k = 5,
      corpusBlocks = 3, probeBlocks = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val bf = Similarity.bruteForceTopK(
      emb, emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(blocked == bf)
  }

  test("capped build equals uncapped on a skewed corpus (recall preserved)") {
    // deliberately clustered slice: every vector quantizes into ONE hot
    // list (both centers sit far away), so the uncapped join has one
    // quadratic key — exactly the skew the cap exists for
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(200).localCheckpoint()
    val cs = graft.operators.IvfIndex.trainCentroids(
      emb, "vec_id", "embedding", nlist = 4, sampleSize = 50, iters = 2,
      seed = 7L).map(_.toIndexedSeq).toIndexedSeq
    val uncapped = KnnGraph.buildWithCentroids(
      emb, "vec_id", "embedding", k = 3, cs, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val capped = KnnGraph.buildWithCentroidsCapped(
      emb, "vec_id", "embedding", k = 3, cs, nprobe = 2, listCap = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(capped == uncapped,
      "sub-splitting must not change the candidate set: same graph, " +
        "same similarities, same tie-breaks")
  }

  test("capped build bounds the per-join-key corpus group near listCap") {
    val clusteredSkew = (0L until 60L).map { i =>
      // all 60 vectors in one tight ball → one hot list under 2 centers
      (i, Array(1.0f + (i % 7) * 1e-3f, 0.5f + (i % 5) * 1e-3f))
    }.toDF("vec_id", "embedding")
    val cs2 = Seq(Seq(1.0, 0.5), Seq(-1.0, -0.5))
    val cap = 10L
    // replicate the builder's sharding arithmetic and check the bound:
    // hash-splitting ceil(60/10)=6 ways keeps every shard ≪ the 60-row
    // quadratic key (probabilistic balance; 3× slack covers hash skew)
    val homes = clusteredSkew.select(col("vec_id"),
      element_at(
        graft.functions.exprs.centroidIds(col("embedding"), cs2, 1), 1)
        .as("list_id"))
    val counts = homes.groupBy(col("list_id")).agg(count(lit(1)).as("sz"))
      .withColumn("n_shards", ceil(col("sz").cast("double") / cap).cast("int"))
    val maxShard = homes
      .join(counts, Seq("list_id"))
      .groupBy(col("list_id"), pmod(hash(col("vec_id")), col("n_shards")))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(maxShard <= 3 * cap,
      s"hot-list shard of $maxShard rows exceeds 3×cap — sub-split broken")
    // and the capped graph on this fixture still matches uncapped
    val a = KnnGraph.buildWithCentroids(
      clusteredSkew, "vec_id", "embedding", k = 2, cs2, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = KnnGraph.buildWithCentroidsCapped(
      clusteredSkew, "vec_id", "embedding", k = 2, cs2, nprobe = 1, listCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("mutualEdges keeps exactly the reciprocated pairs") {
    val knn = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (4L, 3L))
      .toDF("query_id", "neighbor_id")
    val m = KnnGraph.mutualEdges(knn)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((1L, 2L), (3L, 4L)), "1→3 unreciprocated, dropped")
  }
}
