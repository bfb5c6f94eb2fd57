package graft

import org.apache.spark.sql.functions._

import graft.operators.TemperatureSample

/** [[TemperatureSample.select]]: α=0.5 smoothing must upsample tail
  * groups relative to proportional sampling, deterministically.
  */
class TemperatureSampleSpec extends SparkSuite {
  import spark.implicits._

  // head group 1800 docs, tail group 200: proportional selection gives
  // 9:1; sqrt smoothing gives sqrt(1800):sqrt(200) = 3:1
  private lazy val docs = (
    (0L until 1800L).map(i => (i, "head")) ++
      (10000L until 10200L).map(i => (i, "tail"))
  ).toDF("doc_id", "grp")

  private lazy val sel =
    TemperatureSample.select(docs, "doc_id", $"grp", budget = 200.0)
      .groupBy($"grp").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap

  test("tail group is upsampled vs proportional") {
    // expected: head 200*3/4 = 150 (rate 8.3%), tail 200/4 = 50 (rate
    // 25%) — a 3.0× rate ratio; md5 sampling noise on 50 expected tail
    // picks is ±~6 (1σ), so assert a generous 1.5× margin
    val headRate = sel("head").toDouble / 1800.0
    val tailRate = sel("tail").toDouble / 200.0
    assert(tailRate > 1.5 * headRate, s"got head=$headRate tail=$tailRate")
    assert(sel.values.sum > 150 && sel.values.sum < 250)
  }

  test("selection is layout-independent and re-runnable") {
    val a = TemperatureSample.select(docs, "doc_id", $"grp", 200.0)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = TemperatureSample.select(docs.repartition(17), "doc_id", $"grp", 200.0)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("rate caps at 1.0: a tiny group under a huge budget is kept whole") {
    val tiny = ((0L until 1000L).map(i => (i, "big")) ++ Seq((9999L, "solo")))
      .toDF("doc_id", "grp")
    val kept = TemperatureSample.select(tiny, "doc_id", $"grp", budget = 5000.0)
      .filter($"grp" === "solo").count()
    assert(kept == 1L)
  }
}
