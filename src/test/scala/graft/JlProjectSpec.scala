package graft

import org.apache.spark.sql.functions._

import graft.operators.JlProject
import graft.functions.exprs

/** JL Rademacher projection: kernel exactness vs a Scala reference,
  * the distance-preservation property the lemma promises, and layout
  * invariance of the distortion pairs.
  */
class JlProjectSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val signs = JlProject.signMatrix(k = 16, dim = 64, seed = 33L)

  test("sign matrix is deterministic, rectangular, ±1") {
    assert(signs == JlProject.signMatrix(16, 64, 33L))
    assert(signs.size == 16 && signs.forall(_.size == 64))
    assert(signs.flatten.forall(v => v == 1 || v == -1))
    // both signs actually occur
    assert(signs.flatten.toSet == Set(1, -1))
  }

  test("quantize + project + distance kernels equal a plain Scala reference") {
    val rows = Tables.embeddings(spark, dir).filter($"vec_id" < 20)
      .select($"vec_id", $"embedding",
        exprs.quantizeVec($"embedding", 1024).as("qv"))
      .withColumn("pv", exprs.signedProject($"qv", signs))
      .as[(Long, Seq[Float], Seq[Long], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, emb, qv, pv) =>
      val refQ = emb.map(x => math.floor(x.toDouble * 1024).toLong)
      assert(qv == refQ)
      val refP = signs.map(row => row.zip(refQ).map { case (s, q) => s * q }.sum)
      assert(pv == refP)
    }
    // distance kernel on the first two rows
    val a = rows(0)._3; val b = rows(1)._3
    val got = Tables.embeddings(spark, dir).filter($"vec_id" < 2)
      .agg(collect_list($"embedding")).as[Seq[Seq[Float]]].head()
    assert(got.size == 2)
    val d = spark.range(1).select(
      exprs.longVecDistSq(
        typedLit(a), typedLit(b)).as("d")).as[Long].head()
    assert(d == a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
  }

  test("projection preserves distances: most pairs within 2.5x of expected ppm") {
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val pairs = JlProject.distortionPairs(
      emb.filter($"vec_id" < 100), emb.filter($"vec_id" < 10),
      "vec_id", "embedding", signs)
    val ppm = pairs.select($"ppm").as[Long].collect()
    assert(ppm.nonEmpty)
    val within = ppm.count(p => p >= 250000L && p <= 2500000L)
    assert(within.toDouble / ppm.length >= 0.8,
      s"only $within/${ppm.length} pairs within distortion band")
  }

  test("distortion pairs are layout-invariant") {
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    def run(c: org.apache.spark.sql.DataFrame) =
      JlProject.distortionPairs(c, emb.filter($"vec_id" < 5),
        "vec_id", "embedding", signs)
        .select($"query_id", $"neighbor_id", $"orig_d2", $"proj_d2", $"ppm")
        .as[(Long, Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2))
    val base = run(emb.filter($"vec_id" < 100))
    assert(base.nonEmpty)
    assert(base.sameElements(run(emb.filter($"vec_id" < 100).repartition(7, $"vec_id"))))
  }
}
