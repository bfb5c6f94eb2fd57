package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** [[Bpe.train]] against hand-computed merge tables and the classic
  * greedy edge cases, plus layout-independence (the determinism the
  * oracle relies on).
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed corpus: argmax pair and tie-break") {
    // "ab" ×3, "abc" ×2 → pairs: (a,b): 5, (b,c): 2 → first merge (a,b)
    // round 2: encodings [ab], [ab, c] → (ab,c): 2 → second merge
    val docs = Seq("ab ab ab abc abc").toDF("text")
    val m = Bpe.train(docs, "text", 2).orderBy($"step").collect()
    assert(m.map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq(("a", "b", 5L), ("ab", "c", 2L)))
  }

  test("greedy non-overlapping: aaaa -> [aa][aa], aaa -> [aa][a]") {
    val docs = Seq("aaaa aaa").toDF("text")
    val m = Bpe.train(docs, "text", 2).orderBy($"step").collect()
    // round 1 pairs: aaaa has 3 (a,a), aaa has 2 → merge (a,a) count 5
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(3)) == ("a", "a", 5L))
    // after greedy apply: aaaa -> [aa,aa], aaa -> [aa,a]
    // round 2 pairs: (aa,aa): 1, (aa,a): 1 → tie → lexicographic (aa,a) wins?
    // tie-break is left ASC then right ASC: ("aa","a") < ("aa","aa")
    assert((m(1).getString(1), m(1).getString(2), m(1).getLong(3)) == ("aa", "a", 1L))
  }

  test("ties break by (left ASC, right ASC)") {
    // "xy" and "pq" each once → counts tied at 1 → (p,q) wins (p < x)
    val docs = Seq("xy pq").toDF("text")
    val m = Bpe.train(docs, "text", 1).collect()
    assert((m(0).getString(1), m(0).getString(2)) == ("p", "q"))
  }

  test("merge table is layout-independent") {
    val base = Tables.documents(spark, "/root/testdata/sf0.001").select($"text")
    val a = Bpe.train(base, "text", 4).orderBy($"step").collect().toSeq
    val b = Bpe.train(base.repartition(13), "text", 4).orderBy($"step").collect().toSeq
    val c = Bpe.train(base.coalesce(1), "text", 4).orderBy($"step").collect().toSeq
    assert(a == b && b == c)
  }

  test("early exhaustion: single-char vocab stops before numMerges") {
    val docs = Seq("a b c").toDF("text")
    val m = Bpe.train(docs, "text", 5).collect()
    assert(m.isEmpty)
  }

  test("segmentEncoding applies merges without crossing token fences") {
    val enc = Seq("er er verse").toDF("text")
      .select(Bpe.segmentEncoding($"text", Seq("e" -> "r")).as("e"))
      .as[String].head()
    // every "er" merged; the token fence | never participates
    assert(enc == " er  |  er  |  v  er  s  e ")
  }

  test("subwordCount matches the encoding") {
    val df = Seq("er er verse", "", "solo").toDF("text")
      .select(
        Bpe.subwordCount(
          Bpe.segmentEncoding($"text", Seq("e" -> "r")),
          graft.operators.TextOps.tokenCount($"text")).as("n"))
    assert(df.as[Long].collect().toSeq == Seq(6L, 0L, 4L))
  }
}
