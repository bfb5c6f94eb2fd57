package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact second-moment (unnormalized covariance) accumulator over an
  * embedding column, on an integer grid: each coordinate quantizes to
  * `floor(v · 1024)` (scaling by a power of two is exact for float →
  * double) and the aggregator sums `q_i · q_j` for every
  * upper-triangle pair `i < j` as 64-bit integers.
  *
  * Integer products make the result independent of aggregation order
  * — the classic float-covariance pitfall (per-partition partial sums
  * reduce in shuffle-arrival order, so no two runs of a double SUM
  * agree in the last ulp) — so the matrix is bit-identical across
  * partitionings AND across engines, i.e. oracle-checkable. This is
  * the covariance analog of the exact-integer k-means that trains
  * [[graft.operators.IvfIndex]].
  *
  * Scale shape: ONE typed Aggregator whose buffer is a single
  * `dim(dim−1)/2`-long array — map-side partials reduce rows to one
  * buffer per task before the exchange, so the shuffle carries
  * `partitions × 1` buffers, never `rows × dim²` exploded pairs (the
  * naive posexplode² + groupBy formulation). Buffer entries bound:
  * |q| ≤ 1024·max|v|, so n·q² needs n ≲ 2⁶³/(1024·max|v|)² rows —
  * ~10¹² docs at unit-normalized embeddings; past that, shard the
  * corpus and merge per-shard matrices (they add exactly).
  *
  * Output: flat upper-triangle `Seq[Long]`, linear index
  * k = i·dim − i(i+1)/2 + (j − i − 1) for i < j.
  */
class CovarianceSketch(dim: Int)
    extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {

  private val nPairs = dim * (dim - 1) / 2

  override def zero: Array[Long] = new Array[Long](nPairs)

  override def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
    val q = new Array[Long](dim)
    var i = 0
    val m = math.min(dim, v.length)
    while (i < m) { q(i) = math.floor(v(i).toDouble * 1024.0).toLong; i += 1 }
    var k = 0
    i = 0
    while (i < dim) {
      var j = i + 1
      while (j < dim) { b(k) += q(i) * q(j); j += 1; k += 1 }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < nPairs) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Count-Min sketch over a token column (Cormode & Muthukrishnan 2005
  * — the classic mergeable heavy-hitter summary): `depth` hash rows ×
  * `width` counters; each token increments one counter per row
  * (bucket = md5-lower63 of `"j:token"` mod width, the engine's
  * portable hash family), and a point estimate is the MIN over rows —
  * always ≥ the true count, within εN with probability 1−δ for
  * width = e/ε, depth = ln(1/δ).
  *
  * Scale shape: the buffer is ONE flat `depth·width` long array —
  * map-side partials collapse each task's token stream into a single
  * 4096-counter buffer before the exchange, and merge is elementwise
  * addition, so the sketch is layout-independent (integer sums
  * commute) and shards' sketches merge exactly. That is the entire
  * point at 100 TB: per-shard sketches reduce to one, no second pass
  * over the corpus, and the md5 bucket family means a SQL oracle can
  * recompute any cell as a bucket-collision sum.
  */
class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], tok: String): Array[Long] = {
    var j = 0
    while (j < depth) {
      b(j * width + (Md5Hash.lower63(s"$j:$tok") % width).toInt) += 1L
      j += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    val n = depth * width
    while (k < n) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
