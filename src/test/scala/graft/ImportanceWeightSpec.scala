package graft

import org.apache.spark.sql.functions._

import graft.operators.ImportanceWeight

/** [[ImportanceWeight.selectTopK]] against a hand-computed unigram
  * ratio table and a planted target-like/target-unlike split.
  */
class ImportanceWeightSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed scores: smoothed integer ratios, exact") {
    val docs = Seq(
      (1L, "tgt", "apple apple banana"),
      (2L, "bg", "apple apple apple"),
      (3L, "bg", "cherry cherry cherry")).toDF("doc_id", "source", "text")
    val out = ImportanceWeight
      .selectTopK(docs, "doc_id", "text", $"source" === "tgt", k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // vocab: apple tc=2 bc=3 -> (3*1e6)//4 = 750000
    //        banana tc=1 bc=0 -> (2*1e6)//1 = 2000000
    //        cherry tc=0 bc=3 -> target-absent -> 0
    // doc2 = 3*750000 = 2250000; doc3 = 0
    assert(out == Seq((2L, 2250000L, 3L), (3L, 0L, 3L)))
  }

  test("target-like background docs outrank target-unlike ones") {
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
    // plant: two extra background docs — one repeating a src0 doc's
    // text (maximally target-like), one of out-of-vocab gibberish
    val src0Text = base.filter($"source" === "src0")
      .orderBy($"doc_id").select($"text").as[String].head()
    val planted = base.select($"doc_id", $"source", $"text").unionAll(
      Seq(
        (100001L, "bgx", src0Text),
        (100002L, "bgx", "zzq wwk vvj uup ttn zzq wwk vvj uup ttn"))
        .toDF("doc_id", "source", "text"))
    val scores = ImportanceWeight
      .selectTopK(planted, "doc_id", "text", $"source" === "src0", k = 1000)
      .select($"doc_id", $"importance").as[(Long, Long)].collect().toMap
    // the src0-copy scores strictly positive; background-only
    // gibberish is target-anchored to exactly zero
    assert(scores(100001L) > 0L)
    assert(scores(100002L) == 0L)
    assert(scores(100001L) > scores(100002L))
  }

  test("scores are layout-independent") {
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = ImportanceWeight
      .selectTopK(base, "doc_id", "text", $"source" === "src0", 20)
      .as[(Long, Long, Long)].collect().toSeq
    val b = ImportanceWeight
      .selectTopK(base.repartition(11), "doc_id", "text", $"source" === "src0", 20)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
  }
}
