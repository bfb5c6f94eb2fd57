package graft

import graft.operators.UnigramLm

/** [[UnigramLm.train]] semantics on hand-computable corpora: maximal-
  * munch E-step, bottom-k prune with (cnt, piece) tie-break, char
  * fallback after a prune, and the full-coverage invariant.
  */
class UnigramLmSpec extends SparkSuite {
  import spark.implicits._

  test("maximal munch keeps the whole-word piece when it is in vocab") {
    // "abab" ×10: the len-4 piece wins at pos 1, so the only surviving
    // piece is the word itself (chars stay in vocab but are unused)
    val docs = Seq.fill(10)("abab").map(Tuple1(_)).toDF("text")
    val out = UnigramLm.train(docs, "text",
        maxPieceLen = 6, minCount = 2, rounds = 2, pruneDenom = 4)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("piece") == "abab")
    assert(r.getAs[Long]("cnt") == 10L)
    assert(r.getAs[Double]("prob") == 1.0)
  }

  test("prune drops the lowest-count multi piece; its word falls back to chars") {
    // round-1 multi usage: ab:5 cd:4 ef:3 gh:2 → k = 4/4 = 1 prunes
    // gh; round 2 re-segments "gh" as chars g, h
    val docs = Seq(
      (Seq.fill(5)("ab") ++ Seq.fill(4)("cd") ++
        Seq.fill(3)("ef") ++ Seq.fill(2)("gh")).mkString(" "))
      .map(Tuple1(_)).toDF("text")
    val out = UnigramLm.train(docs, "text",
        maxPieceLen = 6, minCount = 2, rounds = 2, pruneDenom = 4)
      .collect()
      .map(r => r.getAs[String]("piece") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("prob")))
      .toMap
    assert(out == Map(
      "ab" -> (5L, 5.0 / 16.0), "cd" -> (4L, 4.0 / 16.0),
      "ef" -> (3L, 3.0 / 16.0), "g" -> (2L, 2.0 / 16.0),
      "h" -> (2L, 2.0 / 16.0)))
  }

  test("prune tie on count breaks lexicographically ascending") {
    // aa/bb/cc all cnt 2, dd cnt 3 → k = 1 drops "aa" (smallest piece
    // among the tied lowest counts), never bb/cc
    val docs = Seq(
      (Seq.fill(2)("aa") ++ Seq.fill(2)("bb") ++
        Seq.fill(2)("cc") ++ Seq.fill(3)("dd")).mkString(" "))
      .map(Tuple1(_)).toDF("text")
    val out = UnigramLm.train(docs, "text",
        maxPieceLen = 6, minCount = 2, rounds = 2, pruneDenom = 4)
      .collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[Long]("cnt"))
      .toMap
    assert(out("a") == 4L)           // "aa" ×2 → chars after the prune
    assert(out.contains("bb") && out.contains("cc") && out.contains("dd"))
    assert(!out.contains("aa"))
  }

  test("segmentWords: maximal munch with unknown-char pass-through") {
    import org.apache.spark.sql.functions.col
    val vocab = Seq("ab", "bc", "abc").toDF("piece")
    val words = Seq("abcd", "zq", "xabc", "abc").toDF("word")
    val out = UnigramLm.segmentWords(words, vocab, maxPieceLen = 6)
      .orderBy(col("word")).collect()
      .map(r => r.getAs[String]("word") -> r.getSeq[String](1).toList)
      .toMap
    assert(out("abcd") == List("abc", "d")) // longest match, then unk 'd'
    assert(out("zq") == List("z", "q"))     // fully unknown word
    assert(out("xabc") == List("x", "abc")) // unk prefix then munch
    assert(out("abc") == List("abc"))
  }

  test("coverage invariant: counts reconstruct every token's length") {
    // whatever the segmentation, Σ cnt·len(piece) over survivors must
    // equal the total character mass of the training tokens
    val docs = Seq("spark scans columns", "spark sorts rows columns",
      "scans rows").map(Tuple1(_)).toDF("text")
    val rows = UnigramLm.train(docs, "text",
        maxPieceLen = 6, minCount = 2, rounds = 2, pruneDenom = 4)
      .collect()
    val mass = rows.map(r =>
      r.getAs[Long]("cnt") * r.getAs[String]("piece").length).sum
    val expected = Seq("spark", "scans", "columns", "spark", "sorts",
      "rows", "columns", "scans", "rows").map(_.length.toLong).sum
    assert(mass == expected)
    assert(math.abs(rows.map(_.getAs[Double]("prob")).sum - 1.0) < 1e-9)
  }
}
