package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** [[NgramLm.bigramBits]] against hand-computed bit costs. */
class NgramLmSpec extends SparkSuite {
  import spark.implicits._

  test("seen/unseen bigram costs, prefix mass, and short-doc zeros") {
    // train (id 0): bigrams (a,b)x2 (b,a)x2 (a,c)x1 → c1: a=3 b=2; N=5
    val docs = Seq(
      (0L, "a b a b a c"),
      (1L, "a b a c a z"),
      (2L, "hello")).toDF("doc_id", "text")
    val out = NgramLm.bigramBits(docs, "doc_id", "text",
        isTrain = col("doc_id") === 0)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    // id 1: (a,b)→bitlen(3)-bitlen(2)=0, (b,a)→0, (a,c)→bitlen(3)-bitlen(1)=1,
    //       (c,a) unseen→bitlen(5)=3, (a,z) unseen→3 ⇒ total 7 over 5
    val d1 = out(0)
    assert(d1.getAs[Long]("n_bigrams") == 5L)
    assert(d1.getAs[Long]("n_unseen") == 2L)
    assert(d1.getAs[Long]("total_bits") == 7L)
    assert(d1.getAs[Double]("mean_bits") == 7.0 / 5.0)
    // id 2: single token — no bigrams, zero cost
    val d2 = out(1)
    assert(d2.getAs[Long]("n_bigrams") == 0L)
    assert(d2.getAs[Long]("n_unseen") == 0L)
    assert(d2.getAs[Long]("total_bits") == 0L)
    assert(d2.getAs[Double]("mean_bits") == 0.0)
  }

  test("clean text scores cheaper than shuffled text under the same model") {
    // reference: repetitive ordered text; probe A repeats the pattern,
    // probe B scrambles it — the LM must prefer A
    val pattern = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (0L, Seq.fill(20)(pattern).mkString(" ")),
      (1L, pattern),
      (2L, "dog the over quick lazy jumps fox brown the")).toDF("doc_id", "text")
    val out = NgramLm.bigramBits(docs, "doc_id", "text",
        isTrain = col("doc_id") === 0)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("mean_bits") < out(1).getAs[Double]("mean_bits"))
  }
}
