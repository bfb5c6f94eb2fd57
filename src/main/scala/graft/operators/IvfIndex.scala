package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.exprs.vecDot

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to hyperplane LSH ([[Similarity.lshTopK]]), following the
  * classic IVF-Flat design (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — coarse quantizer + inverted
  * lists; no PQ compression here).
  *
  * Train: k-means on a driver-side sample (at 100 TB you sample a few
  * 100k vectors — centroid quality needs samples, not the corpus; the
  * training set never exceeds `sampleSize`). Deterministic: seeded
  * sample, k-means++-style farthest-point init, fixed iterations.
  *
  * Index: one scan assigns each vector to its nearest centroid
  * (broadcast centroid literals, argmin over `nlist` dot products —
  * scan-parallel, no shuffle).
  *
  * Search: probes visit only the `nprobe` nearest inverted lists —
  * an equi-join on centroid id replaces the full crossJoin, cutting
  * compared candidates to ≈ corpus × nprobe / nlist.
  */
object IvfIndex {

  /** Deterministic k-means over a driver-side sample. */
  private[operators] def trainCentroids(
      corpus: DataFrame, vecCol: String, nlist: Int,
      sampleSize: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    val sample = corpus.select(col(vecCol))
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length

    // farthest-point init from a seeded start (deterministic k-means++ flavor)
    val centroids = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    centroids += sample((seed % sample.length).toInt.abs)
    while (centroids.length < math.min(nlist, sample.length)) {
      var best: Array[Double] = null
      var bestD = -1.0
      sample.foreach { v =>
        val d = centroids.map(c => sqDist(v, c)).min
        if (d > bestD) { bestD = d; best = v }
      }
      centroids += best
    }
    var cs = centroids.toArray
    // Lloyd iterations
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cs.length)(new Array[Double](dim))
      val counts = new Array[Int](cs.length)
      sample.foreach { v =>
        val a = argminDist(v, cs)
        counts(a) += 1
        var j = 0
        while (j < dim) { sums(a)(j) += v(j); j += 1 }
      }
      cs = cs.indices.map { i =>
        if (counts(i) == 0) cs(i)
        else sums(i).map(_ / counts(i))
      }.toArray
      it += 1
    }
    cs
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def argminDist(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var i = 0
    while (i < cs.length) {
      val d = sqDist(v, cs(i)); if (d < bestD) { bestD = d; best = i }; i += 1
    }
    best
  }

  /** Deterministic seeded Gaussian centroids — the "load a pre-trained
    * coarse quantizer" path. Production IVF separates training from
    * serving (the quantizer is a fixed index artifact); a seed-derived
    * centroid table makes the whole search path reproducible by a SQL
    * oracle (centroids and half-norms inline as literals).
    */
  def seededCentroids(dim: Int, nlist: Int, seed: Long): IndexedSeq[IndexedSeq[Double]] = {
    val rng = new scala.util.Random(seed)
    IndexedSeq.fill(nlist)(IndexedSeq.fill(dim)(rng.nextGaussian()))
  }

  /** IVF top-k search. Output shape = [[Similarity.bruteForceTopK]].
    *
    * Assignment and probe fan-out run through the
    * [[graft.functions.CentroidIds]] kernel — centroids live inside one
    * expression node instead of a nlist × dim literal forest (‖v−c‖² =
    * ‖v‖² − 2v·c + ‖c‖², row-constant ‖v‖² dropped from the argmin).
    * Cosine rerank uses per-side precomputed norms.
    */
  def topK(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4,
      sampleSize: Int = 10000, iters: Int = 5, seed: Long = 42L): DataFrame = {
    val cs = trainCentroids(corpus, vecCol, nlist, sampleSize, iters, seed)
      .map(_.toIndexedSeq).toIndexedSeq
    searchWithCentroids(corpus, probes, idCol, vecCol, k, cs, nprobe)
  }

  /** IVF search against a fixed (pre-trained / seeded) centroid table. */
  def searchWithCentroids(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int, cs: Seq[Seq[Double]], nprobe: Int): DataFrame = {
    import graft.functions.exprs.centroidIds
    val indexed = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("vec_n"),
      Similarity.l2Norm(col(vecCol)).as("norm_n"),
      element_at(centroidIds(col(vecCol), cs, 1), 1).as("list_id"))
    val fanned = probes.select(
      col(idCol).as("query_id"), col(vecCol).as("vec_q"),
      Similarity.l2Norm(col(vecCol)).as("norm_q"),
      explode(centroidIds(col(vecCol), cs, nprobe)).as("list_id"))
    val pairs = indexed.join(fanned, Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        when(col("norm_n") * col("norm_q") > 0,
          vecDot(col("vec_n"), col("vec_q")) / (col("norm_n") * col("norm_q")))
          .otherwise(lit(0.0)))
    graft.plans.TopKPerGroup(
      pairs, Seq("query_id"), Seq(("cosine_sim", true), ("neighbor_id", false)), k)
      .withColumnRenamed("topk_rank", "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine_sim"))
  }
}
