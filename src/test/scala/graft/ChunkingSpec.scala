package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunking

/** [[Chunking.tokenWindows]]: coverage, right-aligned last window,
  * full-width invariant, and edge docs.
  */
class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def chunksOf(text: String, w: Int, s: Int) =
    Chunking.tokenWindows(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", w, s)
      .orderBy($"chunk_idx")
      .select($"start_tok", $"chunk_tokens", $"chunk_text")
      .as[(Long, Long, String)].collect().toSeq

  test("doc longer than window: strided full windows, last right-aligned") {
    val text = (0 until 70).map(i => s"t$i").mkString(" ")
    val c = chunksOf(text, w = 64, s = 32)
    // n=70: chunk count = 1 + ceil(6/32) = 2; starts 0 and 6 (= 70-64)
    assert(c.map(x => (x._1, x._2)) == Seq((0L, 64L), (6L, 64L)))
    assert(c(1)._3.startsWith("t6 ") && c(1)._3.endsWith(" t69"))
  }

  test("every token is covered and all long-doc windows are full-width") {
    val text = (0 until 200).map(i => s"w$i").mkString(" ")
    val c = chunksOf(text, w = 64, s = 32)
    assert(c.forall(_._2 == 64L))
    val covered = c.flatMap(x => x._1 until (x._1 + x._2)).toSet
    assert(covered == (0L until 200L).toSet)
    // starts advance by stride until the aligned tail
    assert(c.map(_._1) == Seq(0L, 32L, 64L, 96L, 128L, 136L))
  }

  test("short doc: one chunk of its full length; empty doc: none") {
    assert(chunksOf("a b c", 64, 32) == Seq((0L, 3L, "a b c")))
    assert(chunksOf("", 64, 32).isEmpty)
    assert(chunksOf("   ", 64, 32).isEmpty)
  }

  test("exact multiples produce no duplicate tail window") {
    val text = (0 until 96).map(i => s"x$i").mkString(" ")
    // n-w = 32 divisible by stride: starts 0, 32 — no duplicated 32
    assert(chunksOf(text, 64, 32).map(_._1) == Seq(0L, 32L))
  }
}
