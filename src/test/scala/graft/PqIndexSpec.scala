package graft

import org.apache.spark.sql.functions._

import graft.operators.PqIndex

/** Product-quantization ANN: exact-integer encode/ADC semantics,
  * self-match ranking, trained-codebook determinism.
  */
class PqIndexSpec extends SparkSuite {
  import spark.implicits._

  // injective for seeds < 101 (53 is invertible mod 101), so no two
  // corpus vectors coincide except the deliberate duplicate below
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(16)(i => (((seed * 53 + i * 17) % 101) - 50) / 40.0f)

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  test("codes match an in-memory integer argmin reference") {
    val cbs = PqIndex.seededCodebooks(dim = 16, m = 4, ksub = 4, seed = 3L)
    val got = corpus(20)
      .select(col("vec_id"), graft.functions.exprs.pqCodes(col("embedding"), cbs).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    (0 until 20).foreach { i =>
      val w = vec(i).map(f => math.floor(f.toDouble * 1024.0).toLong + 4096L)
      val exp = (0 until 4).map { mi =>
        (0 until 4).minBy { j =>
          val d = (0 until 4).map(x => {
            val dd = w(mi * 4 + x) - cbs(mi)(j)(x); dd * dd
          }).sum
          (d, j)
        }
      }
      assert(got(i.toLong) == exp, s"codes of vec $i")
    }
  }

  test("an identical vector attains the minimal ADC; results are layout-invariant") {
    val base = corpus(50)
    // vec 100 duplicates vec 3's embedding: it gets the probe's own
    // argmin codes, whose table entries are each subspace's minimum —
    // so its ADC is the global minimum. (Coarse codebooks quantize
    // other vectors onto the same codes, so EQUALITY with the min is
    // the guaranteed property, not sole first place.)
    val dup = base.unionAll(Seq((100L, vec(3))).toDF("vec_id", "embedding"))
    val cbs = PqIndex.trainCodebooks(dup, "vec_id", "embedding",
      m = 4, ksub = 4, sampleSize = 100, iters = 3, seed = 5L)
    def run(df: org.apache.spark.sql.DataFrame) =
      PqIndex.topK(df, df.filter(col("vec_id") === 3), "vec_id", "embedding",
        k = 60, codebooks = cbs)
        .orderBy(col("rank"))
        .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    val res = run(dup)
    val minD = res.map(_._3).min
    assert(res.find(_._1 == 100L).exists(_._3 == minD),
      s"identical vector must attain the minimal ADC: $res")
    assert(res.map(_._2) == (1 to res.length), "ranks are dense 1..n")
    assert(res == run(dup.repartition(17)), "layout must not change ADC results")
  }

  test("ivfAdcTopK: candidates come only from visited lists; layout-invariant") {
    val df = corpus(60)
    val coarse = graft.operators.IvfIndex.seededCentroids(dim = 16, nlist = 4, seed = 2L)
    val cbs = PqIndex.seededCodebooks(dim = 16, m = 4, ksub = 4, seed = 3L)
    def run(d: org.apache.spark.sql.DataFrame) =
      PqIndex.ivfAdcTopK(d, d.filter(col("vec_id") < 3), "vec_id", "embedding",
        k = 10, coarse = coarse, codebooks = cbs, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val res = run(df)
    assert(res.nonEmpty)
    assert(res == run(df.repartition(13)), "routing+ADC must be layout-invariant")
    // routing really restricts: nprobe=all-lists must see a superset
    val full = PqIndex.ivfAdcTopK(df, df.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 1000, coarse = coarse, codebooks = cbs, nprobe = 4)
      .count()
    val routed = PqIndex.ivfAdcTopK(df, df.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 1000, coarse = coarse, codebooks = cbs, nprobe = 1)
      .count()
    assert(routed < full, s"nprobe=1 ($routed) must visit fewer candidates than all lists ($full)")
  }

  test("RQ codes are the SEQUENTIAL two-level argmin; ADC equals the combined distance") {
    val cb1 = PqIndex.seededCodebooks(dim = 16, m = 1, ksub = 8, seed = 31L).head
    val cb2 = PqIndex.seededResidualCodebook(dim = 16, k = 8, seed = 33L)
    val got = corpus(30)
      .select(col("vec_id"),
        graft.functions.exprs.rqCodes(col("embedding"), cb1, cb2).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def sq(v: Seq[Long], c: Seq[Long]): Long =
      v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    (0 until 30).foreach { i =>
      val w = vec(i).map(f => math.floor(f.toDouble * 1024.0).toLong + 4096L).toSeq
      val c1 = cb1.indices.minBy(j => (sq(w, cb1(j)), j))
      val r = w.zip(cb1(c1)).map { case (a, b) => a - b }
      val c2 = cb2.indices.minBy(j => (sq(r, cb2(j)), j))
      assert(got(i.toLong) == Seq(c1, c2), s"vec $i")
    }

    // end-to-end: rqTopK's adc_dist is exactly ||w_q - (c1+c2)||^2
    val df = corpus(30)
    val top = PqIndex.rqTopK(df, df.filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 3, cb1, cb2).collect()
    assert(top.nonEmpty)
    top.foreach { row =>
      val q = vec(row.getLong(0).toInt).map(f => math.floor(f.toDouble * 1024.0).toLong + 4096L).toSeq
      val n = row.getLong(1).toInt
      val codes = got(n.toLong)
      val comb = cb1(codes(0)).zip(cb2(codes(1))).map { case (a, b) => a + b }
      assert(row.getLong(3) == sq(q, comb), s"pair $row")
    }
  }

  test("trained codebooks are a pure function of the data (layout-invariant)") {
    val df = corpus(60)
    val a = PqIndex.trainCodebooks(df, "vec_id", "embedding", m = 4, ksub = 4,
      sampleSize = 50, iters = 2, seed = 9L)
    val b = PqIndex.trainCodebooks(df.repartition(13), "vec_id", "embedding",
      m = 4, ksub = 4, sampleSize = 50, iters = 2, seed = 9L)
    assert(a == b)
    assert(a.length == 4 && a.forall(cb => cb.length == 4 && cb.forall(_.length == 4)))
  }
}
